#!/usr/bin/env python
"""Per-round benchmark: headline queries + CDC replay throughput.

Runs on local[$SPARK_GRAFT_CPUS] against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "cdc": {...}}

The CDC section is the north-rule metric: events/sec sustained through
the full exactly-once streaming replay (readStream -> foreachBatch ->
transactional snapshot commits), measured end-to-end including commits.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CDC_EVENTS = int(os.environ.get("ETL_SPARK_BENCH_EVENTS", "400000"))
CDC_BATCHES = int(os.environ.get("ETL_SPARK_BENCH_BATCHES", "4"))
CDC_WARMUP = int(os.environ.get("ETL_SPARK_BENCH_WARMUP", "20000"))
# realistic payloads: source files are KBs, and the normalize/NFC/sha256
# pipeline must do real per-row work for the number to mean anything
CDC_CONTENT_BYTES = int(os.environ.get("ETL_SPARK_BENCH_CONTENT_BYTES", "1024"))

# headline query subset: one per operator family, weighted toward the
# scale-sensitive paths (joins, LSH self-joins, vector math)
HEADLINE = [
    "agg_pricing_summary",
    "join_topk_revenue",
    "join_region_revenue",
    "window_top3_orders",
    "cdc_lww_latest_state",
    "docs_quality",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash64_pairs",
    "dedup_embedding_neardup_bucketed",
    "ann_cosine_topk",
    "ann_ivf_kmeans_topk",
    "emb_label_stats",
    # the only iterator-UDF path (secret scan feeding a broadcast
    # anti-join) — benchmarked per VERDICT r2 item 7
    "docs_redact_clean",
]


def _burn(k: int) -> int:  # module-level: picklable for pool workers
    x = 0
    for i in range(k):
        x += i * i
    return x


def steal_probe() -> dict:
    """Machine-speed fingerprint (VERDICT r3 item 3): pure-Python compute
    rates at 1, CPUS/2, and CPUS workers, measured right before the
    bench.  Cross-round query-time comparisons are only attributable to
    code when the probes agree — the r3 +15% uniform shift had no such
    control and stayed unexplained (host steal vs regression).

    The headline ratio is ``wide_scale`` = rate(CPUS) / (2·rate(CPUS/2)):
    the single→CPUS ratio is confounded by single-core turbo (measured on
    a HEALTHY idle host: 16.0 Mops at 1 worker vs 10.3 Mops/core at 32 —
    a 1→32 'scale' of 0.645 with zero steal), so it is recorded for
    context only.  Half-width→full-width sees almost the same all-core
    clock on both legs (13.9 vs 10.3 Mops/core → 0.93 healthy) and
    collapses when the hypervisor withholds cores from the wide leg."""
    from concurrent.futures import ProcessPoolExecutor

    def rate(workers: int) -> float:
        t0 = time.monotonic()
        with ProcessPoolExecutor(workers) as ex:
            list(ex.map(_burn, [4_000_000] * workers * 2))
        return workers * 2 * 4_000_000 / (time.monotonic() - t0)

    r1 = rate(1)
    rh = rate(max(1, CPUS // 2))
    rn = rate(CPUS)
    # deliverable aggregate memcpy bandwidth: the CPU legs are blind to
    # hypervisor DRAM/IPC throttling, which is the steal mode that
    # actually dominates this VM's bench variance (shuffles, stage
    # writes, and parquet encodes are memory streams, not ALU loops)
    from etl_spark.benchref import gather_rate, membw_rate, update_best_membw

    bw = membw_rate(max(1, CPUS // 4))
    update_best_membw(max(1, CPUS // 4), bw)
    return {
        "single_mops": round(r1 / 1e6, 1),
        "half_mops": round(rh / 1e6, 1),
        "parallel_mops": round(rn / 1e6, 1),
        "wide_scale": round(rn / (2 * rh), 3),
        # legacy 1→CPUS ratio; turbo-confounded, context only
        "parallel_scale": round(rn / r1 / CPUS, 3),
        "membw_gbps": bw,
        # latency/MLP leg of the health triple (benchref.gather_rate):
        # collapses under hypervisor memory contention that neither the
        # ALU loop nor the memcpy stream can see — context, not a gate
        "gather_mps": gather_rate(max(1, CPUS // 4)),
    }


# the bench GATES on its own steal probe (VERDICT r4 #1/#2): r4's
# headline shipped with the probe showing parallel capacity HALVED
# (179.8 Mops vs the healthy ~330) and nothing acting on it, voiding
# every cross-round wall-time comparison.  Two independent gate legs:
#   ratio  — wide_scale (half→full width) must hold ≥ PROBE_MIN;
#   absolute — parallel_mops must reach ABS_FRAC of the best capacity
#     this machine family has ever shown (persisted in
#     BENCH/probe_ref.json, max-updating), catching uniform steal that
#     slows both probe legs equally and so leaves every ratio intact.
PROBE_MIN = float(os.environ.get("ETL_SPARK_BENCH_PROBE_MIN", "0.8"))
ABS_FRAC = float(os.environ.get("ETL_SPARK_BENCH_ABS_FRAC", "0.6"))
# memcpy-bandwidth floor (fraction of the machine family's best): the
# CPU legs are blind to hypervisor DRAM/IPC throttling — the steal mode
# that bandwidth-starved the 2026-08-18 scaling pairs while every CPU
# ratio stayed healthy
MEMBW_FRAC = float(os.environ.get("ETL_SPARK_BENCH_MEMBW_FRAC", "0.6"))
PROBE_WAIT_SEC = int(os.environ.get("ETL_SPARK_BENCH_PROBE_WAIT", "3600"))
PROBE_POLL_SEC = int(os.environ.get("ETL_SPARK_BENCH_PROBE_POLL", "120"))
# end-of-run steal check: absolute parallel Mops must not collapse below
# this fraction of the start probe's (ratio-based scale is turbo-skewed
# after a long run — see comment at the end-probe call site)
END_ABS_FRAC = float(os.environ.get("ETL_SPARK_BENCH_END_ABS_FRAC", "0.6"))


def _probe_ref_mops() -> float:
    from etl_spark.benchref import best_mops

    return best_mops(CPUS)


def _update_probe_ref(mops: float) -> None:
    from etl_spark.benchref import update_best_mops

    update_best_mops(CPUS, mops)


def _probe_clean(probe: dict, ref: float) -> list[str]:
    """Empty list = clean; else the reasons the host looks degraded."""
    reasons = []
    if probe["wide_scale"] < PROBE_MIN:
        reasons.append(
            f"wide_scale {probe['wide_scale']} < {PROBE_MIN}"
        )
    if ref and probe["parallel_mops"] < ABS_FRAC * ref:
        reasons.append(
            f"parallel {probe['parallel_mops']} Mops < "
            f"{ABS_FRAC} x machine best {ref}"
        )
    if "membw_gbps" in probe:
        from etl_spark.benchref import best_membw

        ref_bw = best_membw(max(1, CPUS // 4))
        if ref_bw and probe["membw_gbps"] < MEMBW_FRAC * ref_bw:
            reasons.append(
                f"membw {probe['membw_gbps']} GB/s < "
                f"{MEMBW_FRAC} x machine best {ref_bw}"
            )
    return reasons


def wait_for_clean_host() -> dict:
    """Retry the steal probe until both gate legs pass (bounded by
    PROBE_WAIT_SEC).  If the window expires, proceed anyway but the
    caller stamps the result ``degraded`` so no reader ever mistakes
    host steal for an engine regression."""
    deadline = time.monotonic() + PROBE_WAIT_SEC
    probe = steal_probe()
    _update_probe_ref(probe["parallel_mops"])
    while _probe_clean(probe, _probe_ref_mops()) and time.monotonic() < deadline:
        print(
            f"  host degraded ({'; '.join(_probe_clean(probe, _probe_ref_mops()))});"
            f" retrying in {PROBE_POLL_SEC}s"
            f" (up to {int(deadline - time.monotonic())}s left)",
            file=sys.stderr,
        )
        time.sleep(PROBE_POLL_SEC)
        probe = steal_probe()
        _update_probe_ref(probe["parallel_mops"])
    return probe


def bench_queries(spark) -> dict[str, float]:
    # LOCAL_QUERIES: the headline set includes local-only baselines
    # (e.g. join_region_revenue) kept comparable across rounds
    from etl_spark.queries import LOCAL_QUERIES as QUERIES

    out: dict[str, float] = {}
    for name in HEADLINE:
        # best-of-2: the fluctuating-steal host makes single samples
        # swing ±40%; the faster trial is the least-interfered one
        times, n = [], 0
        for _ in range(2):
            t0 = time.monotonic()
            df = QUERIES[name](spark, SF_DIR)
            n = df.count()
            times.append(round(time.monotonic() - t0, 3))
        out[name] = min(times)
        print(f"  {name}: {out[name]:.2f}s (runs {times}, {n} rows)", file=sys.stderr)
    # scale-path embedding near-dup (sign-LSH bucketed, not the oracle's
    # quadratic form)
    from etl_spark.ops.dedup import embedding_neardup_pairs

    t0 = time.monotonic()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = embedding_neardup_pairs(emb, threshold=0.5, bucket_bits=6).count()
    out["dedup_embedding_neardup_lsh"] = round(time.monotonic() - t0, 3)
    print(f"  dedup_embedding_neardup_lsh: {out['dedup_embedding_neardup_lsh']:.2f}s"
          f" ({n} rows)", file=sys.stderr)
    return out


def bench_cdc_replay(spark) -> dict:
    """Full streaming replay of a generated change stream; returns
    events/sec including all transactional commit overhead.  Runs the
    replay twice on the same corpus — copy-on-write (the round-over-round
    comparable number) and merge-on-read auto mode (delta files +
    debt-capped fold-down) — and verifies both land identical state."""
    from etl_spark.catalog.table import LakeTable
    from etl_spark.fixtures import events_df, write_event_batches
    from etl_spark.streaming.tailer import run_tailer

    root = tempfile.mkdtemp(prefix="etl_spark_bench_")
    try:
        # warm-up replay into a scratch table: pays the one-time JVM
        # whole-stage-codegen + Arrow-Python-worker costs so the measured
        # number is SUSTAINED throughput (the 10^10-event steady state),
        # not cold-start latency
        if CDC_WARMUP > 0:
            wev = events_df(spark, CDC_WARMUP, seed=7, content_bytes=CDC_CONTENT_BYTES)
            write_event_batches(wev, os.path.join(root, "wev"), 2, order="seq")
            wt = LakeTable.create(spark, os.path.join(root, "wtable"), n_buckets=8)
            run_tailer(
                wt, os.path.join(root, "wev"), os.path.join(root, "wckpt"),
                mode="replay", max_files_per_trigger=1,
            )

        ev_dir = os.path.join(root, "events")
        ev = events_df(
            spark, CDC_EVENTS, seed=42, n_repos=50, paths_per_repo=200,
            hot_pct=20, content_bytes=CDC_CONTENT_BYTES,
        )
        write_event_batches(ev, ev_dir, CDC_BATCHES, order="seq")
        # actual payload volume (deletes carry null content; padding is
        # line-granular) — nominal content_bytes would overstate MB/s
        from pyspark.sql import functions as F

        actual_bytes = int(
            spark.read.parquet(f"{ev_dir}/*.parquet")
            .agg(F.sum(F.length("content")))
            .first()[0]
        )
        table = LakeTable.create(
            spark, os.path.join(root, "table"), n_buckets=32, salt=8
        )
        t0 = time.monotonic()
        run_tailer(
            table,
            ev_dir,
            os.path.join(root, "ckpt"),
            mode="replay",
            max_files_per_trigger=1,
        )
        wall = time.monotonic() - t0
        n_final = table.read().count()

        # forced MoR: at this corpus shape (delta ≈ base per batch) the
        # auto heuristic would correctly stay copy-on-write, so forcing
        # the delta path is what actually exercises delta writes + the
        # debt-capped fold-down end-to-end
        mor = LakeTable.create(
            spark, os.path.join(root, "table_mor"), n_buckets=32, salt=8,
            write_mode="mor",
        )
        t0 = time.monotonic()
        run_tailer(
            mor,
            ev_dir,
            os.path.join(root, "ckpt_mor"),
            mode="replay",
            max_files_per_trigger=1,
        )
        mor_wall = time.monotonic() - t0
        assert mor.read().count() == n_final, "MoR state diverged from CoW"
        return {
            "events": CDC_EVENTS,
            "batches": CDC_BATCHES,
            "content_bytes": CDC_CONTENT_BYTES,
            "replay_sec": round(wall, 3),
            "events_per_sec": round(CDC_EVENTS / wall, 1),
            "content_mb_per_sec": round(actual_bytes / wall / 1e6, 1),
            "mor_replay_sec": round(mor_wall, 3),
            "mor_events_per_sec": round(CDC_EVENTS / mor_wall, 1),
            "final_rows": n_final,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_tail(spark) -> dict:
    """Steady-state tail mode (VERDICT r3 item 8): processingTime
    micro-batches draining pre-dropped binlog segments one file per
    trigger, reporting per-batch merge latency percentiles — the
    production steady state the availableNow replay number doesn't
    cover.

    Shape matters: production steady state is a SMALL delta ticking over
    a BIG table, so a base load (untimed setup) precedes the tail and the
    keyspace is wide enough that tail batches touch a sliver of it.  The
    table runs write_mode='auto' — the row-amplification test routes these
    batches to merge-on-read deltas exactly as a 10^10-row deployment
    would (the r4 bytes-vs-rows fix; forcing copy-on-write here measured
    ~1.5× slower p50)."""
    from etl_spark.catalog.table import LakeTable
    from etl_spark.fixtures import events_df, write_event_batches
    from etl_spark.pipeline import canonicalize
    from etl_spark.streaming.tailer import run_tailer

    # ≥20 steady batches so the reported percentiles are percentiles of
    # something (VERDICT r4 #8: n=12 made p95 == max)
    n_batches = int(os.environ.get("ETL_SPARK_BENCH_TAIL_BATCHES", "24"))
    n_events = int(os.environ.get("ETL_SPARK_BENCH_TAIL_EVENTS", "240000"))
    n_base = int(os.environ.get("ETL_SPARK_BENCH_TAIL_BASE", "400000"))
    root = tempfile.mkdtemp(prefix="etl_spark_tail_")
    try:
        fixture = dict(
            seed=13, n_repos=50, paths_per_repo=2000, hot_pct=20,
            content_bytes=CDC_CONTENT_BYTES,
        )
        base = events_df(spark, n_base, **fixture)
        ev = events_df(spark, n_events, start_seq=n_base, **fixture)
        ev_dir = os.path.join(root, "events")
        write_event_batches(ev, ev_dir, n_batches, order="seq")
        table = LakeTable.create(
            spark, os.path.join(root, "table"), n_buckets=16, salt=8,
            write_mode="auto",
        )
        table.apply_batch(base, 0, canonicalizer=canonicalize)  # untimed setup
        t0 = time.monotonic()
        q, sink = run_tailer(
            table, ev_dir, os.path.join(root, "ckpt"), mode="tail",
            max_files_per_trigger=1, processing_interval="0 seconds",
            await_termination=False,
        )
        try:
            deadline = time.monotonic() + 600
            while time.monotonic() < deadline:
                applied = [s for s in sink.applied if not s.get("skipped")]
                if len(applied) >= n_batches:
                    break
                time.sleep(0.25)
        finally:
            q.stop()
        wall = time.monotonic() - t0
        applied_stats = [s for s in sink.applied if not s.get("skipped")]
        # sink_ms is the stream's TRUE per-batch wait (merge + commit +
        # any debt-triggered inline compaction); latency_ms (the metrics-
        # table column) is stamped pre-commit and would understate it
        lats = sorted(
            s.get("sink_ms", s.get("latency_ms"))
            for s in applied_stats
            if s.get("sink_ms") or s.get("latency_ms")
        )
        if not lats:
            return {"error": "no batches applied"}

        def pct(vals: list, p: float) -> int:
            return vals[min(len(vals) - 1, int(p * len(vals)))]

        # compaction batches pay a fold-down the steady-state batches
        # don't; report them separately so the p95 is attributable
        steady = sorted(
            s["sink_ms"] for s in applied_stats
            if "sink_ms" in s and not s.get("compacted")
        )
        # median per-phase seconds across steady batches: the diagnosis
        # view for the steady-p50 target — says WHICH phase to attack
        steady_stats = [s for s in applied_stats if not s.get("compacted")]
        phase_med: dict[str, float] = {}
        for k in sorted({
            k
            for s in steady_stats
            for k, v in (s.get("phases") or {}).items()
            if isinstance(v, (int, float)) and not isinstance(v, bool)
        }):
            vals = sorted(
                s["phases"][k]
                for s in steady_stats
                if isinstance(s.get("phases", {}).get(k), (int, float))
                and not isinstance(s.get("phases", {}).get(k), bool)
            )
            phase_med[k] = vals[len(vals) // 2]
        return {
            "batches": len(lats),
            "events": n_events,
            "base_rows": n_base,
            "events_per_batch": n_events // n_batches,
            "modes": {
                m: sum(1 for s in applied_stats if s.get("mode") == m)
                for m in ("mor", "cow")
            },
            "compactions": sum(1 for s in applied_stats if s.get("compacted")),
            "batch_latency_ms_p50": pct(lats, 0.50),
            "batch_latency_ms_p95": pct(lats, 0.95),
            "batch_latency_ms_max": lats[-1],
            "steady_batch_ms_p50": pct(steady, 0.50) if steady else None,
            "steady_batch_ms_p95": pct(steady, 0.95) if steady else None,
            "steady_phase_sec_p50": phase_med,
            "drain_sec": round(wall, 3),
            "events_per_sec": round(n_events / wall, 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from etl_spark.config import get_spark

    extra = {}
    if os.path.isdir("/dev/shm"):
        # the sandbox's virtio disk (~350 MB/s) bottlenecks shuffle
        # spill at every parallelism level — keep shuffle dirs in RAM
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(
        "etl_spark-bench", cores=CPUS, shuffle_partitions=2 * CPUS, extra_conf=extra
    )
    try:
        probe = wait_for_clean_host()
        print(f"  steal probe: {probe}", file=sys.stderr)
        queries = bench_queries(spark)
        cdc = bench_cdc_replay(spark)
        print(f"  cdc_replay: {cdc['replay_sec']:.2f}s "
              f"({cdc['events_per_sec']:.0f} events/s)", file=sys.stderr)
        print(f"  cdc_replay_mor: {cdc['mor_replay_sec']:.2f}s "
              f"({cdc['mor_events_per_sec']:.0f} events/s)", file=sys.stderr)
        tail = bench_tail(spark)
        print(f"  tail: {tail}", file=sys.stderr)
        # probe AGAIN after the measured section: the stamp must reflect
        # the conditions the numbers were actually taken under, not just
        # the gate that admitted them.  The end probe's parallel_scale is
        # NOT comparable to the start probe's — after a long parallel
        # run the single-thread leg runs at turbo frequency, inflating
        # the denominator (observed: single 7.1→14.8 Mops while parallel
        # only moved 228→180 on an idle host).  The signal that steal
        # arrived MID-RUN is absolute parallel capacity collapsing.
        probe_end = steal_probe()
        print(f"  steal probe (end): {probe_end}", file=sys.stderr)
        end_collapsed = probe_end["parallel_mops"] < END_ABS_FRAC * probe[
            "parallel_mops"
        ]
        queries["cdc_replay"] = cdc["replay_sec"]
        queries["cdc_replay_mor"] = cdc["mor_replay_sec"]
        sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
        # the MoR replay is reported per-query and in the cdc section but
        # excluded from the summed headline: the total must stay
        # accounting-comparable with earlier rounds (one CDC replay).
        # Query times are now best-of-2 (policy recorded below) — r3's
        # single-sample times carried unattributable host noise.
        result = {
            "metric": "headline_total_sec",
            "value": round(
                sum(v for k, v in queries.items() if k != "cdc_replay_mor"), 3
            ),
            "unit": "sec",
            "queries": queries,
            "sf": float(sf) if sf else None,
            "cpus": CPUS,
            "cdc": cdc,
            "tail": tail,
            "ceiling": probe,
            "ceiling_end": probe_end,
            # degraded=true means: do NOT read these wall times as an
            # engine signal — the host withheld cores during the run
            # (start-probe gate failed even after the retry window, or
            # absolute parallel capacity collapsed by the end probe)
            "degraded": bool(_probe_clean(probe, _probe_ref_mops()))
            or end_collapsed,
            "query_policy": "best_of_2",
        }
        print(json.dumps(result))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
