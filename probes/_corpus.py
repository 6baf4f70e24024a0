"""Shared hashed-family document corpus for the dedup/curation rungs.

ONE copy of the trap-laden generator (family-of-5 construction,
hashed family tokens, two-stage re-key) so a fix can never silently
miss a probe — the construction notes live in curation_10m_rung.py's
module docstring and are summarized here:

- replica r of base doc d has family g = r // 5, member j = r % 5;
  every 2nd word is replaced by a family-unique token
  ``f<xxhash64(d, g, i) % FAM_TOKEN_SPACE>`` and the member suffix
  `` u<j>`` appended — 5 genuine near-duplicates per family, decorrelated
  across families (the arithmetic-progression generator produced
  shifted-identical token runs; the r10 trap note);
- the jitter select runs while ``doc_id`` is still the BASE id and
  the re-key happens in a SECOND select: an outer column reference
  inside a higher-order-function lambda resolves against the select's
  OWN output alias, unlike plain expressions (the r10 resolution-
  quirk note) — one select would key fam tokens by the FINAL doc_id
  and destroy the family structure;
- ``assert_family_construction`` pins the corpus property after the
  write so this trap class cannot recur silently.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

N_BASE = 5000  # docs in /root/testdata/sf0.1/documents.parquet

# Family-token value space. Round-11 ran with 99,991 and the decade-5
# rung (50M docs = 10M families) measured pairs/doc rising 2.30→2.76 —
# cross-family f-token collisions (1/99991 per aligned slot pair, times
# 10M families) had begun manufacturing near-dup pairs the construction
# doesn't intend: a GENERATOR artifact, not an engine property
# (BASELINE.md round-11 decade-5 row). 10^9-scale keeps the per-slot
# collision rate ≤1e-9 through decade 7 (1B docs); the round-12
# decade-5 rerun re-anchors the per-doc curves on this generator.
FAM_TOKEN_SPACE = 999_999_937


def build_family_corpus(
    spark: SparkSession,
    replicas: int,
    corpus_dir: str,
    extra_cols: tuple[str, ...] = (),
    with_n_chars: bool = False,
    n_files: int = 64,
    block_size_mib: int | None = None,
) -> None:
    """Write ``N_BASE * replicas`` family-of-5 documents to
    ``{corpus_dir}/documents.parquet`` with columns (doc_id, text,
    *extra_cols[, n_chars]).

    ``block_size_mib`` sets ``parquet.block.size`` for the corpus
    write — the decade-5 knee's production lever: a corpus written
    with default 128 MiB row groups costs every downstream scan task a
    128 MiB decode buffer, which at local[32]/16g (0.5 GB/task) is the
    allocation spike that OOMed the composed q69 chain. Size row
    groups to heap-per-executor / cores-per-executor."""
    # Repartition the BASE (5000 rows — a trivial shuffle) before the
    # crossJoin: the broadcast-nested-loop join's output partitioning
    # follows its stream side, so this is what sets the parallelism of
    # everything downstream. The round-11 build ran the expensive
    # family-token transform nearly serial (~23 min at 50M docs)
    # because the join inherited the base scan's 1-2 partitions — the
    # documented crossJoin single-task trap; exchanging the REPLICATED
    # rows instead (the first r12 attempt) moved a corpus-sized
    # shuffle that this formulation avoids entirely.
    base = spark.read.parquet(
        "/root/testdata/sf0.1/documents.parquet"
    ).repartition(n_files)
    # Explicit broadcast hint on the replica range: the layout story
    # (n_files partitions from the base exchange) depends on the range
    # side being the BUILD side of a broadcast nested-loop join. Left
    # to stats, Spark could equally broadcast the 5000-row base parquet
    # (it also sits under autoBroadcastJoinThreshold), which would make
    # spark.range the stream side and silently drop the n_files pin —
    # and the row-group-sizing receipts built on it (ADVICE r12).
    rep = base.crossJoin(
        F.broadcast(spark.range(replicas).withColumnRenamed("id", "r"))
    ).select(
        "doc_id",
        "text",
        *extra_cols,
        "r",
        (F.col("r") / 5).cast("long").alias("g"),
        (F.col("r") % 5).alias("j"),
    )
    words = F.split(F.col("text"), r"\s+")
    # HASHED family tokens (round-10 upgrade): the original arithmetic
    # generator ((37d + 101g + 13i) % 99991) put every family's token
    # sequence on the same step-13 progression, so any (d1,g1)/(d2,g2)
    # with 37Δd + 101Δg ≡ 13k (mod 99991) produced SHIFTED-identical
    # token runs — with the small base vocabulary those windows really
    # match, and cross-family near-dup pairs grew with the square of
    # the family count (measured: 181.8M pairs at 20M docs vs the 40M
    # true family pairs). A per-(d, g, i) hash has no shift structure:
    # families are exactly the 5-member construction plus the base
    # corpus's own planted dups.
    fam_tok = lambda i: F.concat(  # noqa: E731
        F.lit("f"),
        F.pmod(
            F.xxhash64(F.col("doc_id"), F.col("g"), i), F.lit(FAM_TOKEN_SPACE)
        ).cast("string"),
    )
    jittered = F.transform(
        words, lambda w, i: F.when(i % 2 == 1, fam_tok(i)).otherwise(w)
    )
    new_text = F.concat(
        F.array_join(jittered, " "), F.lit(" u"), F.col("j").cast("string")
    )
    # TWO-STAGE select (round-10 fix): jitter FIRST with doc_id still
    # bound to the base id, re-key SECOND. Putting both in one select
    # hits a Spark resolution quirk — an outer column reference inside
    # a HIGHER-ORDER-FUNCTION lambda (fam_tok's doc_id inside
    # F.transform) resolves against the select's OWN output alias (the
    # NEW doc_id), unlike plain expressions, which resolve against the
    # input (verified both ways on this pyspark: plain ref → input,
    # HOF-lambda ref → output). The one-select original therefore
    # keyed fam tokens by the FINAL doc_id — doc-unique tokens, NO
    # true families.
    staged = rep.select(
        "doc_id", "r", "j", *extra_cols, new_text.alias("text")
    )
    final_cols = [
        (F.col("doc_id") + F.col("r") * N_BASE).alias("doc_id"),
        F.col("text"),
        *[F.col(c) for c in extra_cols],
    ]
    if with_n_chars:
        final_cols.append(F.length("text").cast("long").alias("n_chars"))
    # no second repartition: the early exchange already pinned n_files
    # partitions, and a narrow projection preserves them
    writer = staged.select(*final_cols).write.mode("overwrite")
    if block_size_mib is not None:
        writer = writer.option("parquet.block.size", block_size_mib << 20)
    writer.parquet(f"{corpus_dir}/documents.parquet")


def assert_family_construction(spark: SparkSession, corpus_dir: str) -> None:
    """Members 0 and 3 of base doc 7's first family must be equal
    except the 3-char `` u<j>`` suffix — fails loudly if the family
    structure regressed (the silent-trap guard). Needs replicas >= 4
    (member 3 must exist) — checked, so a tiny corpus fails with the
    real reason instead of a KeyError."""
    chk = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{corpus_dir}/documents.parquet")
        .filter(F.col("doc_id").isin(7, 7 + 3 * N_BASE))
        .collect()
    }
    assert len(chk) == 2, (
        "family check needs replicas >= 4 (member 3 of base doc 7 absent)"
    )
    assert chk[7][:-3] == chk[7 + 3 * N_BASE][:-3], "family construction broken"
