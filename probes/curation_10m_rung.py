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

    python probes/curation_10m_rung.py [REPLICAS] [--keep] \
        [--block-mib M] [--only q21,q69] [--cpus N]

``--keep`` (or bare ``keep``) skips the corpus delete so a follow-on
probe (e.g. incremental_dedup_rung.py with an explicit corpus dir)
can reuse the build instead of paying it twice.
``--block-mib M`` writes the corpus with M-MiB parquet row groups —
the decade-5 knee's named production lever (BASELINE.md round-11 row:
32 concurrent scan tasks each buffering a default 128 MiB row group
OOMed a 0.5 GB/task budget; row groups sized to heap/cores should
complete at local[32]).
``--only`` runs a comma-separated subset of the chain stages (keys
q21/q22/q23/q68/q69) so a lever rerun pays only the stage under test.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from strat_backtest_spark.session import get_spark  # noqa: E402


def parse_args(argv: list[str]) -> argparse.Namespace:
    # ADVICE r11: bare int() over positional argv crashed on any flag
    # ("keep" as argv[1], flags without values). argparse owns it now;
    # bare "keep" is still accepted for r10/r11 command-line parity.
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("replicas", nargs="?", type=int, default=2000)
    ap.add_argument("keep_compat", nargs="?", choices=["keep"], default=None,
                    help="legacy positional form of --keep")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--block-mib", type=int, default=None,
                    help="parquet row-group size for the corpus write, MiB")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated stage subset, e.g. q69 or q21,q23")
    ap.add_argument("--cpus", type=int, default=32)
    ns = ap.parse_args(argv)
    ns.keep = ns.keep or ns.keep_compat == "keep"
    return ns


def main() -> None:
    ns = parse_args(sys.argv[1:])
    replicas = ns.replicas
    spark = get_spark(cpus=ns.cpus)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    out = {"replicas": replicas, "docs": 5000 * replicas}
    if ns.block_mib:
        out["block_mib"] = ns.block_mib

    corpus_dir = f"/tmp/docs_rung_{replicas}x"
    t0 = time.time()
    # shared hashed-family generator (probes/_corpus.py) — the round-10
    # generator + resolution-quirk trap notes live there and in this
    # module's docstring; the build-time assertion pins the corpus
    # property so the trap class cannot recur silently
    from _corpus import assert_family_construction, build_family_corpus

    build_family_corpus(
        spark,
        replicas,
        corpus_dir,
        extra_cols=("lang", "source"),
        with_n_chars=True,
        n_files=64,
        block_size_mib=ns.block_mib,
    )
    out["corpus_build_s"] = round(time.time() - t0, 1)
    assert_family_construction(spark, corpus_dir)

    from strat_backtest_spark.plans.catalog import CATALOG

    def run(name: str, key: str) -> None:
        t = time.time()
        df = CATALOG[name].fn(spark, corpus_dir)
        out[key + "_rows"] = df.count()
        out[key + "_s"] = round(time.time() - t, 1)
        print(json.dumps({key: out[key + "_s"], "rows": out[key + "_rows"]}),
              file=sys.stderr, flush=True)

    stages = [
        ("q21_dedup_exact", "exact_dedup", "q21"),
        ("q22_minhash_signatures", "minhash_sigs", "q22"),
        ("q23_minhash_lsh_pairs", "lsh_pairs", "q23"),
        ("q68_dedup_apply", "dedup_apply", "q68"),
        ("q69_curation_end_to_end", "curation", "q69"),
    ]
    only = set(ns.only.split(",")) if ns.only else None
    if only is not None and not only <= {s[2] for s in stages}:
        raise SystemExit(
            f"--only got {sorted(only)}; valid: {sorted(s[2] for s in stages)}"
        )
    for name, key, short in stages:
        if only is None or short in only:
            run(name, key)
    if not ns.keep:
        import shutil

        shutil.rmtree(corpus_dir, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
