"""Decade-3 rung for the composed curation chains: 10M documents.

Corpus construction matters for near-dup rungs: a naive replicate-
with-suffix-jitter corpus puts ALL replicas of a base doc into the
same LSH family (suffix jitter almost never moves a minhash minimum),
so family size = replication factor and candidate pairs grow
quadratically in it — at 2000x replication that is ~2M pairs per
family, ~10B total: a data property (boilerplate at cap size), not an
engine property, and not the regime the earlier 5M rung measured. The
tiny synthetic base vocabulary adds a second trap: any construction
that only reuses base words makes EVERY doc's shingles collide with
the benchmark pool, so decontamination drops the whole corpus.

This probe therefore builds bounded, vocabulary-expanding families:

  replica r of base doc d (r in [0, REPLICAS)) has
    family g = r // 5, member j = r % 5
    words  = base words of d, with every 2nd word replaced by a
             family-unique token f<(37*d + 101*g + 13*i) % 99991>
    text   = join(words) || ' u<j>'

The 5 members of one family differ by a single suffix token — genuine
near-duplicates (signatures mostly identical, family bucket size 5).
Different families share at most the sparse all-original-word
shingles, so cross-family signatures are decorrelated and a doc's
overlap with the q69 benchmark shingle pool stays below the 0.5
contamination threshold. Pairs stay linear in corpus size — the
realistic curation regime. doc_id = d + 5000*r; lang/source inherited
from d; n_chars recomputed; 64 parquet files (probe-layout row).

Chain wall times run the CATALOG entries against the corpus dir —
identical code paths to the gate. Prints one JSON line.

    python probes/curation_10m_rung.py [REPLICAS] [keep]

``keep`` skips the corpus delete so a follow-on probe (e.g.
incremental_dedup_rung.py with an explicit corpus dir) can reuse the
build instead of paying it twice.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from strat_backtest_spark.session import get_spark  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark(cpus=32)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    out = {"replicas": replicas, "docs": 5000 * replicas}

    corpus_dir = f"/tmp/docs_rung_{replicas}x"
    t0 = time.time()
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = 5000
    rep = base.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "r")
    ).select(
        "doc_id",
        "text",
        "lang",
        "source",
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
    # true family pairs; survivors merged below the family count). A
    # per-(d, g, i) hash has no shift structure: families are exactly
    # the 5-member construction plus the base corpus's own planted
    # dups.
    fam_tok = lambda i: F.concat(
        F.lit("f"),
        F.pmod(F.xxhash64(F.col("doc_id"), F.col("g"), i), F.lit(99991)).cast(
            "string"
        ),
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
    # F.transform) resolves against the select's OWN output alias
    # (the NEW doc_id), unlike plain expressions, which resolve
    # against the input (verified both ways on this pyspark: plain
    # ref → input, HOF-lambda ref → output). The one-select original
    # therefore keyed fam tokens by the FINAL doc_id — doc-unique
    # tokens, NO true families; the r8 10M rows' 35.5M "pairs" were
    # modular f-token collisions (f-space is 99,991 values), not the
    # documented family-of-5 structure. The build-time assertion below
    # pins the corpus property so this class of trap cannot recur
    # silently.
    staged = rep.select(
        "doc_id", "r", "j", "lang", "source", new_text.alias("text")
    )
    (
        staged.select(
            (F.col("doc_id") + F.col("r") * n_base).alias("doc_id"),
            "text",
            "lang",
            "source",
            F.length("text").cast("long").alias("n_chars"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{corpus_dir}/documents.parquet")
    )
    out["corpus_build_s"] = round(time.time() - t0, 1)

    # corpus-property assertion: members 0 and 3 of base doc 7's first
    # family must be equal except the 3-char " u<j>" suffix
    chk = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{corpus_dir}/documents.parquet")
        .filter(F.col("doc_id").isin(7, 7 + 3 * n_base))
        .collect()
    }
    assert chk[7][:-3] == chk[7 + 3 * n_base][:-3], "family construction broken"

    from strat_backtest_spark.plans.catalog import CATALOG

    def run(name: str, key: str) -> None:
        t = time.time()
        df = CATALOG[name].fn(spark, corpus_dir)
        out[key + "_rows"] = df.count()
        out[key + "_s"] = round(time.time() - t, 1)
        print(json.dumps({key: out[key + "_s"], "rows": out[key + "_rows"]}),
              file=sys.stderr, flush=True)

    run("q21_dedup_exact", "exact_dedup")
    run("q22_minhash_signatures", "minhash_sigs")
    run("q23_minhash_lsh_pairs", "lsh_pairs")
    run("q68_dedup_apply", "dedup_apply")
    run("q69_curation_end_to_end", "curation")
    if "keep" not in sys.argv[2:]:
        import shutil

        shutil.rmtree(corpus_dir, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
