"""End-to-end corpus cleaning: the composition a training-data pipeline
actually runs over raw documents —

    quality filter  [→ decontamination]  →  exact dedup
        →  near-dup clustering  →  disposition

Every doc receives exactly one status:

- ``quality``      — failed the Gopher-rule quality bounds
                     (:func:`..functions.textstats.quality_flags`);
- ``contaminated`` — (only with ``bench_ds``) a quality survivor whose
                     distinct k-token shingles overlap the benchmark's
                     in ≥ ``min_overlap`` positions
                     (:func:`..stages.dedup.decontaminate` semantics);
- ``exact_dup``    — byte-identical text to a lower-id surviving doc
                     (sha256 groupby; text never shuffles for this stage);
- ``near_dup``     — n-gram-Jaccard ≥ threshold connected-component with a
                     lower-id member (:func:`..stages.dedup.near_dup_groups`);
- ``kept``         — the canonical survivor.

plus a ``group_id``: −1 for quality rejects, the keeper's id for exact
dups, the near-dup cluster's min id otherwise (``group_id == doc_id``
for every kept doc).

Deterministic and fully SQL-expressible — the DuckDB twin
(``__ray_entry__._corpus_clean_sql``) reproduces all three stages
including the candidate df-cap and the transitive closure.

Scale shape: two object-store materializations (the quality-filtered
corpus ``S`` and the exact-deduped corpus ``SE`` — both spillable,
``S`` released once ``SE`` exists), a sha-keyed coarse shuffle that
ships 8-byte ids + 32-byte digests (never text), one id-keyed coarse
shuffle that ships the surviving text into the near-dup stage, and the
shingle exchanges inside :func:`near_dup_groups`. No driver round-trips;
reducer memory is bounded by the coarse-group size (~2k docs).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.dedup import _coarse_of_ids, near_dup_groups

# status codes travel the shuffles as int8; decoded to strings at the end.
# Numeric order IS the override priority in resolve() ('quality' the default).
_QUALITY, _CONTAM, _EXACT_DUP, _NEAR_DUP, _KEPT = 0, 1, 2, 3, 4
_STATUS_NAMES = np.array(["quality", "contaminated", "exact_dup", "near_dup", "kept"])


class _QualityDecontam:
    """Fused quality + decontamination pass: ONE read of the text computes
    the Gopher flags and — for quality survivors only, so rejected docs
    never pay the shingle work — the benchmark shingle-overlap count
    against the broadcast bench set. Emits survivors with their text and
    contaminated ids with null text; downstream splits on nullness, so
    the corpus still streams through a single stage with no extra pass."""

    def __init__(self, bench_ref, text_col: str, id_col: str, k: int,
                 min_overlap: int, bounds: dict):
        from ..stages.dedup import _OverlapCount

        self.ov = _OverlapCount(bench_ref, text_col, id_col, k)
        self.text_col, self.id_col = text_col, id_col
        self.min_overlap, self.bounds = int(min_overlap), bounds

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.textstats import quality_flags

        q = quality_flags(batch[self.text_col].to_pylist(), **self.bounds)
        surv = batch.select([self.id_col, self.text_col]).filter(pa.array(q["keep"]))
        ov = self.ov(surv)  # (doc_id, n_overlap) — same row order as surv
        contam = ov["n_overlap"].to_numpy() >= self.min_overlap
        clean = surv.filter(pa.array(~contam))
        n_c = int(contam.sum())
        return pa.table({
            "doc_id": pa.concat_arrays([
                clean[self.id_col].cast(pa.int64()).combine_chunks(),
                ov["doc_id"].filter(pa.array(contam)).combine_chunks(),
            ]),
            self.text_col: pa.concat_arrays([
                clean[self.text_col].cast(pa.string()).combine_chunks(),
                pa.array([None] * n_c, pa.string()),
            ]),
        })


def corpus_clean(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    threshold: float = 0.5,
    k: int = 3,
    max_shingle_df: int = 50,
    min_shared: int = 2,
    pair_backend: str = "exact",
    bounds: dict | None = None,
    concurrency=None,
    n_rows: int | None = None,
    ids=None,
    bench_ds=None,
    decontam_k: int = 8,
    min_overlap: int = 1,
    redact: bool = False,
):
    """→ Dataset (doc_id, status, group_id) — one row per input doc.

    ``redact=True`` prepends the PII scrub (``stages/pii.py``) so
    quality metrics and dedup hashes see the REDACTED text — two docs
    differing only in an email/IP/phone become exact duplicates, the
    standard scrub-before-dedup order of the C4/RefinedWeb recipes (one
    stateless stage; no extra scan or shuffle).

    ``bounds`` overrides individual Gopher rule bounds (see
    ``textstats.GOPHER_BOUNDS``); ``threshold``/``k``/``max_shingle_df``
    parameterize the near-dup stage exactly like
    :func:`..stages.dedup.ngram_jaccard_pairs`. ``ids`` optionally
    supplies an id-only Dataset for the default-status leg (pass a
    pruned read so the final pass never re-decodes text).

    ``bench_ds`` (optional) switches on the decontamination stage: a
    small benchmark/eval Dataset whose distinct ``decontam_k``-token
    shingles are broadcast once; quality survivors overlapping it in ≥
    ``min_overlap`` shingles are removed (status ``contaminated``)
    BEFORE dedup, so a contaminated doc can never become a keeper. The
    check fuses into the quality pass — no extra corpus scan or shuffle.

    Mirrors the cleaning pass a reference user would express as a chain
    of ingest processors + dedup jobs; statuses are the audit trail
    (resumable: rerunning over the same input is idempotent).
    """
    from ..functions.textstats import quality_flags

    bounds = bounds or {}
    if redact:
        from ..stages.pii import redact_pii

        ds = redact_pii(ds, text_col=text_col, counts=False)
    contam_ids = None  # Dataset of contaminated doc ids (bench_ds only)

    if bench_ds is not None:
        from ..util import pool
        from ..stages.dedup import bench_shingle_ref

        ref = bench_shingle_ref(bench_ds, text_col, id_col, decontam_k, concurrency)
        # FS: survivors carry text, contaminated ids carry null text —
        # one materialization feeds both splits (filters over it are
        # cheap re-runs; the text scan + flags + shingling run once).
        FS = ds.map_batches(
            _QualityDecontam,
            fn_constructor_kwargs=dict(bench_ref=ref, text_col=text_col, id_col=id_col,
                                       k=decontam_k, min_overlap=min_overlap, bounds=bounds),
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=pool(concurrency),
        ).materialize()
        import pyarrow.compute as pc

        S = FS.map_batches(
            lambda b: b.filter(pc.is_valid(b[text_col])),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        contam_ids = FS.map_batches(
            lambda b: b.filter(pc.is_null(b[text_col])).select(["doc_id"]),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()  # ids only — tiny; lets FS release once S is consumed
        # rename to the caller's id column so sha_rows/s_leg read it uniformly
        if id_col != "doc_id":
            S = S.map_batches(lambda b: b.rename_columns([id_col, text_col]),
                              batch_format="pyarrow", zero_copy_batch=True)
        n_s = S.count()
    else:
        def keep_quality(batch: pa.Table) -> pa.Table:
            q = quality_flags(batch[text_col].to_pylist(), **bounds)
            return batch.select([id_col, text_col]).filter(pa.array(q["keep"]))

        # S: the quality-filtered corpus. Materialized because it fans out
        # to the sha leg and the semi-join leg (consuming a lazy diamond
        # would re-run the scan + flags once per consumer).
        S = ds.map_batches(keep_quality, batch_format="pyarrow", zero_copy_batch=True).materialize()
        n_s = S.count()
    nc = max(16, n_s // 2_000)

    # ---- exact-dedup disposition: (doc_id, keeper) ----
    def sha_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        # 64-bit prefix of sha256: the shuffle ships 16 B/doc, and the
        # keeper decision only needs equality (collisions ~n²/2⁶⁴)
        sha = np.fromiter(
            (int.from_bytes(hashlib.sha256((t or "").encode()).digest()[:8], "big") for t in batch[text_col].to_pylist()),
            dtype=np.uint64,
            count=batch.num_rows,
        ).astype(np.int64)
        ck = _coarse_of_ids(sha, nc)
        return pa.table({"doc_id": pa.array(ids), "sha": pa.array(sha), "ckey": pa.array(ck)})

    def keeper_of_group(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("sha", sort=False)["doc_id"].transform("min")
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64), "keeper": m.to_numpy(np.int64)})

    disp = (
        S.map_batches(sha_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ckey")
        .map_groups(keeper_of_group, batch_format="pandas")
        .materialize()  # tiny (16 B/doc); read twice below
    )

    # ---- SE: exact-dedup survivors with text (id-keyed coarse co-group) ----
    def s_leg(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "ckey": pa.array(_coarse_of_ids(ids, nc)),
            "keeper": pa.array(np.full(ids.size, -1, np.int64)),
            text_col: batch[text_col],
        })

    def disp_leg(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "ckey": pa.array(_coarse_of_ids(ids, nc)),
            "keeper": pa.array(batch["keeper"].to_numpy().astype(np.int64)),
            text_col: pa.array([None] * ids.size, pa.string()),
        })

    def keep_if_keeper(g: pd.DataFrame) -> pd.DataFrame:
        texts = g[g["keeper"] < 0]
        keep_ids = g.loc[(g["keeper"] >= 0) & (g["keeper"] == g["doc_id"]), ["doc_id"]]
        out = keep_ids.merge(texts[["doc_id", text_col]], on="doc_id", how="inner")
        return out[["doc_id", text_col]]

    import pyarrow.compute as _pc

    n_exact_dups = disp.map_batches(
        lambda b: pa.table({"d": pa.array([int(_pc.sum(_pc.not_equal(b["doc_id"], b["keeper"])).as_py() or 0)])}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).sum("d") or 0
    if n_exact_dups == 0:
        # no identical texts → the semi-join is the identity; skip its
        # text-bearing shuffle and feed S straight to the near-dup stage
        SE = S.map_batches(
            lambda b: pa.table({"doc_id": b[id_col].cast(pa.int64()), text_col: b[text_col]}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
        n_se = n_s
    elif n_exact_dups <= 100_000:
        # small dup set → broadcast the dup-id list and anti-filter in
        # place of the text-bearing co-group shuffle (the classic
        # broadcast-small-side join; 100k ids ≈ 800 KB)
        dup_tbl = disp.map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"].take(
                _pc.indices_nonzero(_pc.not_equal(b["doc_id"], b["keeper"])))}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()
        dup_ids = np.sort(dup_tbl["doc_id"].to_numpy(np.int64))

        def drop_dups(b: pa.Table) -> pa.Table:
            ids_ = b[id_col].to_numpy().astype(np.int64)
            keep = ~np.isin(ids_, dup_ids, assume_unique=True)
            t = b.filter(pa.array(keep))
            return pa.table({"doc_id": t[id_col].cast(pa.int64()), text_col: t[text_col]})

        SE = S.map_batches(drop_dups, batch_format="pyarrow", zero_copy_batch=True).materialize()
        n_se = n_s - int(n_exact_dups)
    else:
        SE = (
            S.map_batches(s_leg, batch_format="pyarrow", zero_copy_batch=True)
            .union(disp.map_batches(disp_leg, batch_format="pyarrow", zero_copy_batch=True))
            .groupby("ckey")
            .map_groups(keep_if_keeper, batch_format="pandas")
            .materialize()
        )
        n_se = SE.count()
    del S  # release the pre-dedup corpus from the object store

    # ---- near-dup clustering over the exact survivors ----
    # min_shared=2 default: a qualifying pair at threshold 0.5 over
    # ≥50-token docs shares ≥24 shingles, so requiring 2 low-df shared
    # shingles costs no recall while pruning the generic-shingle
    # candidate flood (mirrored in the SQL twin's HAVING clause).
    # pair_backend='minhash' swaps in LSH candidate generation — the
    # 10^12-doc path (probabilistic recall; no SQL twin — pytest-covered)
    if pair_backend == "exact":
        groups = near_dup_groups(
            SE, text_col, "doc_id", k=k, threshold=threshold,
            max_shingle_df=max_shingle_df, concurrency=concurrency, n_rows=n_se,
            min_shared=min_shared,
        )
    elif pair_backend == "minhash":
        from ..stages.dedup import near_dup_groups_minhash

        groups = near_dup_groups_minhash(
            SE, text_col, "doc_id", k=k, threshold=threshold,
            concurrency=concurrency, n_rows=n_se,
        )
    else:
        raise ValueError(f"unknown pair_backend {pair_backend!r}")

    # ---- resolve: one status row per input doc ----
    # Default leg gives every doc 'quality'; the exact/near legs override
    # (a doc has at most one override row). Rank = status code works as
    # the override priority because 'quality' is 0.
    def default_leg(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "ckey": pa.array(_coarse_of_ids(ids, nc)),
            "code": pa.array(np.zeros(ids.size, np.int8)),
            "group_id": pa.array(np.full(ids.size, -1, np.int64)),
        })

    def exact_leg(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        keeper = batch["keeper"].to_numpy().astype(np.int64)
        m = keeper != ids
        return pa.table({
            "doc_id": pa.array(ids[m]),
            "ckey": pa.array(_coarse_of_ids(ids[m], nc)),
            "code": pa.array(np.full(m.sum(), _EXACT_DUP, np.int8)),
            "group_id": pa.array(keeper[m]),
        })

    def group_leg(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy()
        gid = pc.cast(batch["group_id"], pa.int64()).to_numpy()
        code = np.where(gid < ids, _NEAR_DUP, _KEPT).astype(np.int8)
        return pa.table({
            "doc_id": pa.array(ids),
            "ckey": pa.array(_coarse_of_ids(ids, nc)),
            "code": pa.array(code),
            "group_id": pa.array(gid),
        })

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        m = g.sort_values("code").groupby("doc_id", sort=False).last().reset_index()
        return pd.DataFrame({
            "doc_id": m["doc_id"].to_numpy(np.int64),
            "status": _STATUS_NAMES[m["code"].to_numpy(np.int8)],
            "group_id": m["group_id"].to_numpy(np.int64),
        })

    def contam_leg(batch: pa.Table) -> pa.Table:
        cids = batch["doc_id"].to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(cids),
            "ckey": pa.array(_coarse_of_ids(cids, nc)),
            "code": pa.array(np.full(cids.size, _CONTAM, np.int8)),
            "group_id": pa.array(np.full(cids.size, -1, np.int64)),
        })

    ids_ds = ids if ids is not None else ds.select_columns([id_col])
    legs = (
        ids_ds.map_batches(default_leg, batch_format="pyarrow", zero_copy_batch=True)
        .union(disp.map_batches(exact_leg, batch_format="pyarrow", zero_copy_batch=True))
        .union(groups.map_batches(group_leg, batch_format="pyarrow", zero_copy_batch=True))
    )
    if contam_ids is not None:
        legs = legs.union(contam_ids.map_batches(contam_leg, batch_format="pyarrow",
                                                 zero_copy_batch=True))
    return legs.groupby("ckey").map_groups(resolve, batch_format="pandas")


def clean_and_write(ds, out_dir: str, text_col: str = "text", id_col: str = "doc_id",
                    n_shards: int = 64, **clean_kwargs) -> dict:
    """Run :func:`corpus_clean` and write the KEPT docs (id + text) as
    hash-sharded Parquet under ``out_dir/shard=K/`` — the consumable
    output of the cleaning pass. Returns {'kept': n, 'total': n}.

    Shards are deterministic in the doc id and written with atomic
    partition replacement (staging dir + swap), so a rerun reproduces
    the same layout instead of appending duplicates, a failed run never
    leaves a half-written shard visible, and a reader can process shards
    independently.
    The statuses Dataset is the audit log — persist it separately if the
    dispositions matter downstream.
    """
    import pyarrow.compute as pc

    statuses = corpus_clean(ds, text_col, id_col, **clean_kwargs).materialize()
    if clean_kwargs.get("redact"):
        # the written corpus must carry the SAME scrubbed text the
        # dispositions were computed over
        from ..stages.pii import redact_pii

        ds = redact_pii(ds, text_col=text_col, counts=False)
    n_total = statuses.count()

    def kept_leg(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["status"], "kept"))
        ids = t["doc_id"].to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "ckey": pa.array(_coarse_of_ids(ids, max(16, n_total // 2_000))),
            "keeper": pa.array(np.full(ids.size, -2, np.int64)),
            text_col: pa.array([None] * ids.size, pa.string()),
        })

    def text_leg(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "ckey": pa.array(_coarse_of_ids(ids, max(16, n_total // 2_000))),
            "keeper": pa.array(np.full(ids.size, -1, np.int64)),
            text_col: batch[text_col],
        })

    def join_text(g: pd.DataFrame) -> pd.DataFrame:
        kept = g[g["keeper"] == -2][["doc_id"]]
        texts = g[g["keeper"] == -1][["doc_id", text_col]]
        out = kept.merge(texts, on="doc_id", how="inner")
        out["shard"] = (out["doc_id"].to_numpy(np.int64) % n_shards).astype(np.int64)
        return out[["doc_id", text_col, "shard"]]

    kept = (
        statuses.map_batches(kept_leg, batch_format="pyarrow", zero_copy_batch=True)
        .union(ds.map_batches(text_leg, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("ckey")
        .map_groups(join_text, batch_format="pandas")
    )
    from ..stages.sink import _write_replacing_partitions

    _write_replacing_partitions(kept, out_dir, partition_col="shard")
    import pyarrow.dataset as pads

    n_kept = pads.dataset(out_dir, partitioning="hive").count_rows()
    return {"kept": n_kept, "total": n_total}
