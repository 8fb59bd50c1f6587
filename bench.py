"""Benchmark harness.

Runs the headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
with ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE
JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_sec": ...}

`--scaling` runs the headline pipeline at two parallelism levels (default
num_cpus=2 and 8, i.e. N and 4N; override via GRAFT_SCALING_LO/HI) in fresh
processes on the same input and reports both throughputs + scaling efficiency
(the sandbox evidence for the N -> 4N cluster criterion; see BASELINE.md).

The headline is the flagship validation pass: transcripts -> vectorized
scalar+ref validation (violations + valid rows, materialized as counts) —
the engine's "validated turns/sec" metric. Additional timed queries cover the
wide conversation shuffle, the salted variant, sketches, and the report plane.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# must be set BEFORE `import ray` (ray_constants reads it at import time):
# 50% of host memory for the object store, Ray Data's own recommendation
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.5")


def _headline(ds, spec):
    """Full scalar validation; consumed via per-batch partial aggregation
    (one (status, n) row per batch) + driver sum — no wide shuffle on the
    log rows just to count them."""
    import pyarrow as pa

    from events_validator_ray.stages.validate import ValidateBatch

    def counts_partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["status"])
            .group_by("status")
            .aggregate([("status", "count")])
            .rename_columns(["status", "n"])
        )

    out = ds.map_batches(
        ValidateBatch(spec, log_valid=True),
        batch_format="pyarrow",
        batch_size=None,  # whole-block batches: the validator is fully vectorized
        zero_copy_batch=True,
    ).map_batches(counts_partial, batch_format="pyarrow")
    df = out.to_pandas().groupby("status")["n"].sum()
    return df.to_dict()


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    rd.DataContext.get_current().enable_progress_bar_name_truncation = False

    from events_validator_ray.logutil import (
        suppress_empty_shuffle_partition_warning,
        suppress_schema_hash_warning,
    )

    suppress_empty_shuffle_partition_warning()
    suppress_schema_hash_warning()

    from events_validator_ray.sources.transcripts import ensure_transcripts, sf_from_dir
    from events_validator_ray.spec import transcript_spec
    from events_validator_ray.stages.conversation import (
        conversation_violations,
        conversation_violations_salted,
    )
    from events_validator_ray.stages.sketches import sketch_dataset

    import glob as _glob

    sf = sf_from_dir(sf_dir)
    tdir = ensure_transcripts(sf)
    spec = transcript_spec()

    # repeat the shard list to scale the measured workload without extra
    # storage (the default ×4 puts ~2.4M turns through the pipeline at sf0.1);
    # n_turns below reflects the rows actually processed
    repeat = int(os.environ.get("GRAFT_BENCH_REPEAT", "4"))
    files = sorted(_glob.glob(os.path.join(tdir, "transcripts_*.parquet"))) * repeat

    # fixed block count (identical at every CPU level): ~2 waves of coarse
    # tasks amortizes stragglers without starving cores (measured optimum;
    # 1 wave is straggler-bound, tiny tasks are dispatch-bound)
    nblocks = int(os.environ.get("GRAFT_BENCH_BLOCKS", "0")) or max(
        2 * num_cpus, min(256, len(files) * 50_000 // 250_000)
    )

    def read():
        return rd.read_parquet(files, override_num_blocks=nblocks)

    # untimed warmup: starts the worker pool and warms the page cache so the
    # timed runs measure compute + shuffle, not cold start
    n_turns = read().count()
    _headline(rd.read_parquet(files[: len(files) // repeat]), spec)

    queries: dict[str, float] = {}
    query_runs: dict[str, list[float]] = {}

    # min-of-N per query (round-3 item 6): the shared host swings wall times
    # 2-3x with co-tenant noise; the min over N back-to-back runs is the
    # repeatable number (the --scaling path has used this discipline since
    # round 1 — applied to every standard-run query from round 3). Round-5
    # noise control (VERDICT r4 item 2): min_of raised to 3, a FIXED no-op
    # control workload (driver-local numpy matmul, constant FLOPs) runs
    # interleaved before every timed attempt, and its swing + every per-query
    # attempt list ship in the JSON — so a slow record is attributable to
    # host noise (control swings with it) vs a code regression (control flat).
    min_of = max(1, int(os.environ.get("GRAFT_BENCH_MIN_OF", "3")))

    import numpy as _np

    _ctrl_a = _np.random.default_rng(0).standard_normal((384, 384))
    control_runs: list[float] = []

    def _control() -> None:
        a = _ctrl_a.copy()
        t0 = time.time()
        for _ in range(40):
            a = a @ _ctrl_a
            a /= _np.abs(a).max()
        control_runs.append(round(time.time() - t0, 4))

    import gc as _gc

    def _timed(fn, repeats: int = 0, label: str | None = None) -> float:
        best = None
        runs: list[float] = []
        for _ in range(repeats or min_of):
            # drop the previous attempt's Dataset refs so its object-store
            # blocks free before the next attempt (otherwise a big query's
            # garbage backpressures the following one)
            _gc.collect()
            _control()
            t0 = time.time()
            fn()
            dt = time.time() - t0
            runs.append(round(dt, 3))
            best = dt if best is None or dt < best else best
        if label is not None:
            query_runs[label] = runs
        return best

    counts_box: dict = {}

    def _run_headline():
        counts_box["counts"] = _headline(read(), spec)

    headline = _timed(_run_headline, 3 if os.environ.get("GRAFT_BENCH_ONLY") else 0, label="validate_scalar")
    counts = counts_box["counts"]
    queries["validate_scalar"] = round(headline, 3)

    def _control_summary() -> dict:
        lo, hi = min(control_runs), max(control_runs)
        return {
            "runs": control_runs,
            "min": lo,
            "max": hi,
            # swing > ~1.5 means the host was contended during this session:
            # read the per-query minima, not the means, and expect BASELINE.md
            # quiet-window envelopes to be faster than this record
            "swing": round(hi / lo, 3) if lo > 0 else None,
        }

    if os.environ.get("GRAFT_BENCH_ONLY"):
        # scaling mode: measure only the headline (compute-bound, larger
        # repeat); min of 3 repeats controls for noisy-neighbor/steal-time
        # variance on the shared host
        ray.shutdown()
        return {
            "metric": "validated turns/sec (scalar+ref validation over transcript corpus)",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "num_cpus": num_cpus,
            "n_turns": n_turns,
            "turns_per_sec": round(n_turns / headline, 1),
            "status_counts": counts,
            "query_runs": query_runs,
            "control": _control_summary(),
        }

    queries["conversation_checks"] = round(
        _timed(lambda: conversation_violations(read(), spec).count(), label="conversation_checks"), 3
    )

    queries["conversation_checks_salted"] = round(
        _timed(
            lambda: conversation_violations_salted(read(), spec, chunk=1000).count(),
            label="conversation_checks_salted",
        ), 3
    )

    queries["sketch_profile"] = round(
        _timed(
            lambda: sketch_dataset(
                read(),
                {
                    "conv_id": ("stats", "hll"),
                    "turn_idx": ("stats", "tdigest"),
                    "role": ("cathist",),
                },
            ),
            label="sketch_profile",
        ),
        3,
    )

    from events_validator_ray.stages.dedup import minhash_lsh_dedup
    from events_validator_ray.stages.similarity import ann_topk

    docs = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(docs):
        queries["dedup_minhash"] = round(
            _timed(lambda: minhash_lsh_dedup(rd.read_parquet(docs), threshold=0.8), label="dedup_minhash"), 3
        )
    emb = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(emb):
        queries["ann_topk"] = round(
            _timed(lambda: ann_topk(rd.read_parquet(emb), [0, 1, 2, 3, 4], k=10), label="ann_topk"), 3
        )

    from events_validator_ray.pipelines.report import failures_by_day
    from events_validator_ray.stages.validate import ValidateBatch

    def _report():
        log = read().map_batches(
            ValidateBatch(spec, log_valid=True, date_from="ts"),
            batch_format="pyarrow",
            batch_size=None,  # whole-block batches: the validator is fully vectorized
            zero_copy_batch=True,
        )
        failures_by_day(log, dim="field").count()

    queries["report_failures_by_day"] = round(_timed(_report, label="report_failures_by_day"), 3)

    # nested-document validation (list<struct> items + struct meta) over the
    # deterministic nested corpus
    from events_validator_ray.sources.nested import NESTED_SPEC_JSON, ensure_nested_events
    from events_validator_ray.spec import load_spec

    ndir = ensure_nested_events(sf)
    nspec = load_spec(NESTED_SPEC_JSON, event_name="purchase")

    def _nested():
        rd.read_parquet(ndir).map_batches(
            ValidateBatch(nspec, log_valid=False, id_cols=("event_id",)),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        ).count()

    queries["validate_nested"] = round(_timed(_nested, label="validate_nested"), 3)

    result = {
        "metric": "validated turns/sec (scalar+ref validation over transcript corpus)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1),
        "status_counts": counts,
        "query_runs": query_runs,
        "control": _control_summary(),
    }
    ray.shutdown()
    return result


def run_scaling(sf_dir: str, lo: int | None = None, hi: int | None = None) -> dict:
    """N vs 4N evidence. Defaults to 2 vs 8 CPUs: this host's single-node
    executor + shared object store flatline near ~7-9M rows/s (and co-tenant
    noise hits high-parallelism legs hardest — see the ladder in BASELINE.md),
    a local-mode artifact rather than a pipeline property: on a real cluster
    each node adds its own raylet/object store. Override via
    GRAFT_SCALING_LO/HI (e.g. 8/32)."""
    lo = lo or int(os.environ.get("GRAFT_SCALING_LO", "2"))
    hi = hi or int(os.environ.get("GRAFT_SCALING_HI", "8"))

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=sf_dir,
            GRAFT_BENCH_ONLY="1",
            GRAFT_BENCH_REPEAT=os.environ.get("GRAFT_SCALING_REPEAT", "64"),
            GRAFT_BENCH_BLOCKS=os.environ.get("GRAFT_SCALING_BLOCKS", "160"),
        )
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                # local-mode Ray workers inherit the DRIVER's cwd, not its
                # sys.path — launched from anywhere else every UDF fails to
                # deserialize with ModuleNotFoundError (CLAUDE.md invariant)
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
        except subprocess.CalledProcessError as e:
            sys.stderr.write(e.stderr or "")
            raise
        return json.loads(out.strip().splitlines()[-1])

    # interleaved sessions per leg (each internally min-of-3); min across
    # sessions — spreads noisy-neighbor windows across both legs fairly.
    # GRAFT_SCALING_SESSIONS raises the session count when the host is
    # contended (the min over more sessions approaches the quiet-window value)
    sessions = max(1, int(os.environ.get("GRAFT_SCALING_SESSIONS", "2")))
    runs_lo, runs_hi = [], []
    for _ in range(sessions):
        runs_lo.append(one(lo))
        runs_hi.append(one(hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (same pipeline, fresh sessions)",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "turns_per_sec_lo": r_lo["turns_per_sec"],
        "turns_per_sec_hi": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": r_hi["sf"],
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        print(json.dumps(run_bench(sf_dir, ncpu)))
