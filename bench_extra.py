"""Extra measurement harness for the optimization round (guide §1).

NOT the driver surface — bench.py is frozen for measurement. This file
isolates each bench-timed query with the noop sink
(df.write.format("noop")), captures .explain("formatted") for the plan
record under plans/r06/, and breaks the kg_e2e pipeline into stage
timings (PipelineRun's lineage already records wall_ms per stage).

Usage:
  python bench_extra.py explain          # capture plans to plans/r06/
  python bench_extra.py time [reps]      # noop-isolated timings (JSON line)
  python bench_extra.py e2e [reps]       # kg_e2e + per-stage breakdown
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_TMP = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/tmp/omx_bench")
PLAN_DIR = os.path.join(REPO, "plans", "r06")


def _load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError):
        return -1.0


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def build_frames(spark, corpus_dir: str):
    """The same frames bench.py's run_queries builds (same repartition
    calls — the timing must match the frozen driver methodology)."""
    from pyspark.sql import functions as F  # noqa: F401

    mentions = spark.read.parquet(
        os.path.join(corpus_dir, "mentions.parquet")
    ).repartition(2 * CPUS)
    edges = spark.read.parquet(os.path.join(corpus_dir, "xref_edges.parquet"))
    terms = spark.read.parquet(os.path.join(corpus_dir, "ontology_terms.parquet"))
    docs = spark.read.parquet(
        os.path.join(corpus_dir, "documents.parquet")
    ).repartition(2 * CPUS)
    return mentions, edges, terms, docs


def query_frames(spark, corpus_dir: str) -> dict:
    """name -> (thunk returning a DataFrame | timed-action callable)."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from ontology_matcher_spark.operators.candidates import generate_candidates
    from ontology_matcher_spark.operators.canonicalize import connected_components
    from ontology_matcher_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from ontology_matcher_spark.operators.validate import validate_mentions
    from ontology_matcher_spark.ontology_types import ONTOLOGY_TYPES

    mentions, edges, terms, docs = build_frames(spark, corpus_dir)
    gene = ONTOLOGY_TYPES["Gene"]
    v = validate_mentions(mentions.where(F.col("label") == "Gene"), gene)
    d = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).repartition(2 * CPUS)
    return {
        "kg_candidates_gene": lambda: generate_candidates(
            v.where(F.col("format_reason").isNull()), edges, gene
        ),
        "kg_cc": lambda: connected_components(
            edges, src="src_curie", dst="dst_curie"
        ),
        "q_pricing_summary": lambda: entry.q_pricing_summary(spark, SF_DIR),
        "q_revenue_by_nation": lambda: entry.q_revenue_by_nation(spark, SF_DIR),
        "dd_exact_dedup": lambda: exact_dedup(d),
        "dd_minhash_pairs": lambda: minhash_lsh_pairs(d),
        "sim_cosine_topk": lambda: entry.q_cosine_topk(spark, SF_DIR),
    }


def cmd_explain(spark, corpus_dir: str, suffix: str) -> None:
    os.makedirs(PLAN_DIR, exist_ok=True)
    for name, thunk in query_frames(spark, corpus_dir).items():
        df = thunk()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(PLAN_DIR, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out}")


def cmd_time(spark, corpus_dir: str, reps: int) -> None:
    from ontology_matcher_spark.operators.dictionary_build import (
        write_detection_artifact,
    )
    from ontology_matcher_spark.operators.mention_detect import detect_mentions

    tag = os.path.basename(corpus_dir.rstrip("/"))
    out: dict[str, list[float]] = {}
    for rep in range(reps):
        frames = query_frames(spark, corpus_dir)
        for name, thunk in frames.items():
            spark.sparkContext.setJobDescription(f"x:{name}:{rep}")
            out.setdefault(name, []).append(round(timed(lambda: noop(thunk())), 3))
        # artifact build: fresh dir per rep (it is a write-type op)
        art = os.path.join(BENCH_TMP, f"x_art_{tag}_{rep}")
        shutil.rmtree(art, ignore_errors=True)
        _, edges, terms, docs = build_frames(spark, corpus_dir)
        spark.sparkContext.setJobDescription(f"x:kg_dict_build:{rep}")
        out.setdefault("kg_dict_build", []).append(
            round(timed(lambda: write_detection_artifact(terms, art, edges)), 3)
        )
        spark.sparkContext.setJobDescription(f"x:kg_detect:{rep}")
        out.setdefault("kg_detect", []).append(
            round(timed(lambda: noop(detect_mentions(docs, art))), 3)
        )
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "load1": _load1(),
        "queries_min": {k: min(v) for k, v in out.items()},
        "queries_all": out,
    }))


def cmd_e2e(spark, corpus_dir: str, reps: int) -> None:
    from ontology_matcher_spark.plans.pipeline import run_pipeline

    walls = []
    stage_walls: list[dict] = []
    for rep in range(reps):
        out_dir = os.path.join(BENCH_TMP, f"x_e2e_{rep}")
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.sparkContext.setJobDescription(f"x:kg_e2e:{rep}")
        t0 = time.time()
        n = run_pipeline(spark, corpus_dir, out_dir, num_partitions=2 * CPUS).count()
        walls.append(round(time.time() - t0, 3))
        lin = (
            spark.read.parquet(os.path.join(out_dir, "lineage"))
            .where("metric = 'rows_out'")
            .select("stage", "wall_ms")
            .collect()
        )
        stage_walls.append({r["stage"]: r["wall_ms"] / 1000 for r in lin})
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "load1": _load1(),
        "n_triples": n,
        "kg_e2e_all": walls,
        "kg_e2e_min": min(walls),
        "stages": stage_walls,
    }))


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    arg = sys.argv[2] if len(sys.argv) > 2 else None
    import bench

    corpus_dir = bench.ensure_bench_corpus()
    from ontology_matcher_spark.session import get_spark

    spark = get_spark("bench-extra", master=f"local[{CPUS}]")
    if cmd == "explain":
        cmd_explain(spark, corpus_dir, arg or "before")
    elif cmd == "time":
        cmd_time(spark, corpus_dir, int(arg or 2))
    elif cmd == "e2e":
        cmd_e2e(spark, corpus_dir, int(arg or 2))
    else:
        raise SystemExit(f"unknown cmd {cmd}")


if __name__ == "__main__":
    main()
