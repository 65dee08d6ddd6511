"""Continuous-tick job runner — the job-scheduler loop of the reference
(``timeseries/JobProcessor.java:129-175``: fire once per detector
interval, run the configured analysis over whatever new data arrived,
write results, persist model state) as a thin CLI over the idempotent
``DetectorAPI.start_job`` / ``forecast_start_job`` tick:

    python -m anomaly_detection_ray.tick \\
        --config detector.json --events /data/events \\
        --results /out/results --checkpoints /out/ckpt \\
        [--forecast --horizon 24] [--interval 600] [--max-ticks 0]

Each tick re-reads the (growing) input path, continues the checkpointed
model streams, and APPENDS only the new windows' rows — overlapping
windows drop as out-of-order, so a tick that sees no new data writes
nothing and reruns are idempotent (the existing start_job tests prove
the incremental semantics; this module only adds the wall-clock loop).

Wall-clock scheduling lives ONLY here (CLI): pipeline code stays
deterministic per CLAUDE.md. This CLI owns its Ray session (guarded
init) — library code never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import time

from .config import DetectorConfig


def config_from_json(d: dict) -> DetectorConfig:
    """DetectorConfig from a plain JSON dict (the create/update surface:
    configs are documents in the reference — ``ad/rest/`` CRUD — stored
    by :class:`..state.configstore.ConfigStore` or a plain file here)."""
    from .state.configstore import config_from_json as _from_json

    return _from_json(d)


def run_ticks(
    api,
    results_dir: str,
    checkpoint_dir: str,
    n_ticks: int = 0,
    interval_s: float | None = None,
    forecast: bool = False,
    horizon: int = 24,
    period: int = 0,
    on_tick=None,
    sleep=time.sleep,
    clock=time.monotonic,
    tail_source=None,
    should_run=None,
) -> int:
    """The scheduler loop. ``n_ticks=0`` runs until interrupted; each
    tick fires at most once per ``interval_s`` of wall time (the job
    interval defaults to the detector interval). ``on_tick(i)`` runs
    after each tick (tests use it to append input data). Returns the
    number of ticks executed.

    With ``tail_source`` (a :class:`..sources.tailing.TailingSource`)
    each tick reads ONLY the files that appeared/changed since the last
    committed tick — the checkpointed model streams make that correct
    (already-seen windows would drop as out-of-order anyway) — and a
    tick with no new files skips the pipeline entirely. The manifest is
    committed only after the tick's results are written, so a crash
    between the two harmlessly reprocesses the same files. Caveat
    (matches the reference's realtime behavior, which also queries only
    the current window): an entity first appearing mid-stream cold-starts
    from the files of ITS tick, not the full history."""
    interval = float(interval_s if interval_s is not None else api.config.interval_s)
    i = 0
    while n_ticks == 0 or i < n_ticks:
        if should_run is not None and not should_run():
            # job doc disabled (stop_job from another process) — the
            # JobProcessor halts until re-enabled; we exit the loop
            break
        t0 = clock()
        files = tail_source.poll() if tail_source is not None else None
        if tail_source is None or files:
            prev_path = api.events_path
            if files:
                api.events_path = files
            try:
                if forecast:
                    api.forecast_start_job(results_dir, checkpoint_dir,
                                           horizon=horizon, period=period)
                else:
                    api.start_job(results_dir, checkpoint_dir)
            finally:
                api.events_path = prev_path
            if tail_source is not None:
                tail_source.commit(files)
        i += 1
        if on_tick is not None:
            on_tick(i)
        if n_ticks and i >= n_ticks:
            break
        elapsed = clock() - t0
        if elapsed < interval:
            sleep(interval - elapsed)
    return i


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Continuous detector/forecast job ticks")
    p.add_argument("--config", default=None, help="DetectorConfig JSON file")
    p.add_argument("--store", default=None,
                   help="ConfigStore root; with --config-id, loads the config "
                        "from the store, flips its job doc on, and stops "
                        "ticking when another process disables it")
    p.add_argument("--config-id", default=None)
    p.add_argument("--events", required=True, help="events parquet file/dir (may grow)")
    p.add_argument("--results", required=True, help="results sink dir")
    p.add_argument("--checkpoints", required=True, help="model checkpoint dir")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--interval", type=float, default=None,
                   help="wall seconds between ticks (default: config interval)")
    p.add_argument("--max-ticks", type=int, default=0, help="0 = run forever")
    p.add_argument("--forecast", action="store_true", help="run forecast job ticks")
    p.add_argument("--horizon", type=int, default=24)
    p.add_argument("--period", type=int, default=0)
    p.add_argument("--tail-manifest", default=None,
                   help="JSON manifest path; when set, each tick reads only "
                        "files new/changed since the last committed tick")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        from .pipelines.api import DetectorAPI

        should_run = None
        if args.store and args.config_id:
            from .state.configstore import ConfigStore

            store = ConfigStore(args.store)
            config = store.get_config(args.config_id)
            store.start_job(args.config_id)
            should_run = lambda: store.job_enabled(args.config_id)  # noqa: E731
        elif args.config:
            with open(args.config) as f:
                config = config_from_json(json.load(f))
        else:
            p.error("either --config or --store/--config-id is required")
        api = DetectorAPI(config, args.events, ts_col=args.ts_col)
        tail = None
        if args.tail_manifest:
            from .sources.tailing import TailingSource

            tail = TailingSource(args.events, args.tail_manifest)
        n = run_ticks(
            api, args.results, args.checkpoints,
            n_ticks=args.max_ticks, interval_s=args.interval,
            forecast=args.forecast, horizon=args.horizon, period=args.period,
            tail_source=tail, should_run=should_run,
        )
        print(json.dumps({"ticks": n, "results": args.results}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
