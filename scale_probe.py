#!/usr/bin/env python
"""Empirical scale-up probe behind SCALING.md.

Replicates the sf0.1 ``documents`` table ``--factor`` times with
position-salted perturbation, then times selected queries warm
(median-of-3) at 1x and at Nx on the same local[32] session. The
question this answers is the one code review can't: does any operator
hide super-linear work, or does any plan flip to a pathological
strategy, when the input grows?

Perturbation design (why replicas are NOT near-duplicates of their
base): every second token of replica r > 0 is suffixed with a
LETTER-ONLY replica salt ('x' + r spelled in letters — digits or
punctuation would be stripped by the engine's ``[^a-z]`` token
cleaning, silently turning replicas back into exact token-level
duplicates; measured: a digit salt exploded the factor-3 pair count
67x). Every 3-token shingle of a perturbed replica then contains at
least one altered token, so replica<->base and replica<->replica
Jaccard is ~0 and the engineered near-dup pairs of the base corpus are
the ONLY near-dup structure — repeated once per replica. Pair-count
output thus grows ~linearly with the factor; replicating text verbatim
would instead grow it quadratically (factor^2 pairs per base
duplicate) and the probe would measure output explosion, not operator
scaling.

doc_id is offset by r * 10_000_000 — a multiple of 10, so the
``doc_id % 10`` benchmark/corpus split used by decontamination keeps
the same 10% benchmark rate per replica.

Usage::

    python scale_probe.py --factor 100 \
        --queries simhash_near_pairs,dedup_minhash_pairs

All non-document tables are symlinked from the base dir, so any
registered query can run against the replicated dir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nlp_with_pyspark_spark.queries import QUERIES  # noqa: E402
from nlp_with_pyspark_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = (
    "simhash_near_pairs,dedup_minhash_pairs,"
    "decontamination_overlap,dedup_canonical_corpus"
)


def build_replicated_dir(spark, base_dir: str, out_dir: str, factor: int) -> None:
    """Materialize ``documents`` x factor into out_dir; symlink the rest."""
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(base_dir):
        dst = os.path.join(out_dir, name)
        if name != "documents.parquet" and not os.path.exists(dst):
            os.symlink(os.path.join(base_dir, name), dst)
    dst = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(dst):
        return
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    reps = (
        spark.range(factor)
        .withColumnRenamed("id", "r")
        # letter-only salt: survives the [^a-z] token cleaning intact
        .withColumn(
            "rsalt",
            F.translate(F.col("r").cast("string"), "0123456789", "abcdefghij"),
        )
    )
    perturbed = F.expr(
        "array_join(transform(split(text, ' '), "
        "(t, i) -> IF((i + r) % 2 = 0, concat(t, 'x', rsalt), t)), ' ')"
    )
    out = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("r") * F.lit(10_000_000)).alias("doc_id"),
        F.when(F.col("r") == 0, F.col("text")).otherwise(perturbed).alias("text"),
        "lang",
        "source",
        F.length(
            F.when(F.col("r") == 0, F.col("text")).otherwise(perturbed)
        ).alias("n_chars"),
    )
    # one file per shuffle partition, ~factor x base size total
    out.repartition(32).write.mode("overwrite").parquet(dst + ".tmp")
    os.rename(dst + ".tmp", dst)


def time_query(spark, name: str, sf_dir: str, runs: int = 3) -> tuple[float, int]:
    fn = QUERIES[name]
    # TWO warm runs: cold-JVM JIT takes more than one pass to reach
    # steady state (measured on dedup_minhash_pairs at sf0.1 in a fresh
    # session: 19.2s, 3.9s, then ~2.1s steady — a single warm run left
    # half the compile cost inside the first sample)
    n_rows = fn(spark, sf_dir).count()
    fn(spark, sf_dir).count()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2], n_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default=DEFAULT_QUERIES)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    out_dir = args.out or f"/tmp/scale{args.factor}x"

    names = [n.strip() for n in args.queries.split(",")]

    if len(names) > 1:
        # one OS PROCESS per query leg: a stopped SparkContext leaves its
        # JVM (and the previous leg's heap garbage) behind, and measured
        # 1x timings after a heavy 100x leg were inflated 3-6x by GC
        # churn even in a fresh session. Subprocesses give each leg a
        # genuinely cold, equally-sized JVM.
        import subprocess

        spark = get_spark(app_name=f"scale-probe-build-{args.factor}x")
        spark.sparkContext.setLogLevel("ERROR")
        build_replicated_dir(spark, args.base, out_dir, args.factor)
        spark.stop()
        results = {}
        for name in names:
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--factor", str(args.factor),
                    "--base", args.base,
                    "--out", out_dir,
                    "--queries", name,
                    "--runs", str(args.runs),
                ],
                capture_output=True,
                text=True,
                check=True,
            )
            line = json.loads(out.stdout.strip().splitlines()[-1])
            results.update(line["results"])
            print(json.dumps({name: results[name]}), flush=True)
        print(json.dumps({"factor": args.factor, "results": results}))
        return

    spark = get_spark(app_name=f"scale-probe-{names[0]}")
    spark.sparkContext.setLogLevel("ERROR")
    build_replicated_dir(spark, args.base, out_dir, args.factor)

    results = {}
    for name in names:
        t1, rows1 = time_query(spark, name, args.base, args.runs)
        tn, rowsn = time_query(spark, name, out_dir, args.runs)
        results[name] = {
            "t_1x": round(t1, 2),
            f"t_{args.factor}x": round(tn, 2),
            "ratio": round(tn / t1, 1),
            "rows_1x": rows1,
            f"rows_{args.factor}x": rowsn,
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"factor": args.factor, "results": results}))


if __name__ == "__main__":
    main()
