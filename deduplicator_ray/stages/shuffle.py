"""Deterministic global corpus shuffle — the "shuffle before training"
operator: assign every document a stable pseudo-random global POSITION,
reproducible across runs/workers/cluster sizes.

Key design: position = global rank of a multiplicative-Weyl key
``key = (doc_id + seed) * C  mod 2^64`` (odd C, so the map is a
bijection — distinct docs never collide, the permutation is exact, and
both numpy uint64 wraparound and DuckDB HUGEINT arithmetic reproduce it
bit-for-bit — no per-row Python hashing anywhere).

Distributed rank WITHOUT a global sort shuffle: the top byte of the key
is an ORDER-PRESERVING bucket (every key in bucket b sorts before every
key in bucket b+1), so
  1. one map pass emits (doc_id, key, bucket) — 17 B/row;
  2. bucket row-counts (256 tiny rows) collect to the driver and prefix-
     sum into offsets, broadcast back;
  3. each bucket independently sorts its keys and adds its offset —
     rank = offset[bucket] + local rank.
Wall-clock is one small-row shuffle + embarrassingly-parallel per-bucket
sorts; document payloads never move.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# golden-ratio odd multiplier (same constant family as the n-gram
# combiner); odd => bijective mod 2^64
SHUFFLE_MULT = 0x9E3779B97F4A7C15


def shuffle_key(doc_ids: np.ndarray, seed: int) -> np.ndarray:
    """uint64 Weyl key; vectorized, overflow-wrapping by construction."""
    with np.errstate(over="ignore"):
        return (doc_ids.astype(np.uint64) + np.uint64(seed)) * np.uint64(
            SHUFFLE_MULT
        )


def stratified_sample(ds, rates, *, seed: int = 0, id_col: str = "doc_id",
                      group_col: str | None = None,
                      default_rate: float = 0.0):
    """Deterministic (seeded) Bernoulli sample, optionally stratified by
    ``group_col`` — the "subsample each language/source at its own rate"
    operator a data-mixing recipe runs before training.

    A doc is kept iff ``shuffle_key(doc_id, seed) < rate * 2^64``.  The
    key is the same bijective multiplicative-Weyl map the global shuffle
    uses, so the decision is map-only (ZERO shuffle, streams at read
    speed), reproducible across runs/workers/cluster sizes, and exactly
    mirrorable in SQL via HUGEINT arithmetic.  Different seeds give
    independent samples; the same seed gives nested samples (rate 0.1 is
    a subset of rate 0.2 — handy for scaling-law ladders).

    ``rates``: a float (uniform rate) or dict ``{group_value: rate}``
    applied via ``group_col`` with ``default_rate`` for unlisted groups.
    ``doc_id`` and ``seed`` must be non-negative (same bit-parity rule as
    ``deterministic_shuffle``).
    """
    if seed < 0:
        raise ValueError("seed must be non-negative")
    if isinstance(rates, dict) and group_col is None:
        raise ValueError("per-group rates require group_col")

    def thr(rate: float) -> int:
        if not (0.0 <= rate <= 1.0):
            raise ValueError(f"rate {rate} outside [0, 1]")
        return int(rate * 2**64)  # == 2^64 means keep-all (keys < 2^64)

    if isinstance(rates, dict):
        # group value -> small code; code -> (threshold, full-keep) lookup
        # tables so the per-batch work is one .map + two fancy indexes.
        groups = list(rates)
        code_of = {g: i for i, g in enumerate(groups)}
        t_all = [thr(rates[g]) for g in groups] + [thr(default_rate)]
        full_lut = np.array([t >= 2**64 for t in t_all])
        t_lut = np.array([min(t, 2**64 - 1) for t in t_all], dtype=np.uint64)
        default_code = len(groups)
    else:
        uniform_t = thr(rates)

    def keep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("stratified_sample requires non-negative ids")
        k = shuffle_key(ids, seed)
        if isinstance(rates, dict):
            codes = b[group_col].to_pandas().map(code_of).fillna(
                default_code
            ).to_numpy(np.int64)
            mask = full_lut[codes] | (k < t_lut[codes])
        elif uniform_t >= 2**64:
            mask = np.ones(len(ids), dtype=bool)
        else:
            mask = k < np.uint64(uniform_t)
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def sample_sql_predicate(rate: float, seed: int) -> str:
    """The DuckDB predicate that reproduces ``stratified_sample`` for one
    rate, bit-for-bit (HUGEINT % 2^64 == numpy uint64 wraparound)."""
    if rate >= 1.0:
        return "TRUE"
    t = int(rate * 2**64)
    return (f"(CAST(doc_id AS HUGEINT) + {seed}) * {SHUFFLE_MULT} "
            f"% 18446744073709551616 < {t}")


def _bucket_offsets(keyed_ds, num_buckets: int,
                    val_col: str | None = None) -> np.ndarray:
    """Exclusive prefix sums of a per-bucket quantity (row count, or the
    sum of ``val_col``) — the tiny driver-side step of the distributed
    rank/cumsum: one row per (block, bucket) travels, never data."""
    def per_block(b: pa.Table) -> pa.Table:
        parts = b["_part"].to_numpy()
        if val_col is None:
            u, c = np.unique(parts, return_counts=True)
            c = c.astype(np.int64)
        else:
            u, inv = np.unique(parts, return_inverse=True)
            c = np.zeros(len(u), dtype=np.int64)
            np.add.at(c, inv, b[val_col].to_numpy().astype(np.int64))
        return pa.table({"_part": pa.array(u.astype(np.int32)),
                         "c": pa.array(c)})

    counts = keyed_ds.map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    full = np.zeros(num_buckets, dtype=np.int64)
    if len(counts):
        per_bucket = counts.groupby("_part")["c"].sum()
        full[per_bucket.index.to_numpy()] = per_bucket.to_numpy()
    offsets = np.zeros(num_buckets, dtype=np.int64)
    np.cumsum(full[:-1], out=offsets[1:])
    return offsets


def deterministic_shuffle(ds, *, seed: int = 0, id_col: str = "doc_id",
                          num_buckets: int = 256):
    """(doc_id, position) — a seeded global permutation of the corpus.

    ``num_buckets`` must be a power of two in [2, 65536]: buckets are the
    top log2(num_buckets) bits of the key, so concatenating buckets in
    bucket order IS the sorted order (order-preserving partitioning — the
    same property a range-partitioned sort relies on, but the ranges are
    known a priori because keys are uniform by construction).

    ``doc_id`` and ``seed`` must be non-negative: numpy's int64->uint64
    wrap and DuckDB's HUGEINT ``%`` disagree on negatives, which would
    break the oracle bit-parity (enforced at runtime).
    """
    if not (2 <= num_buckets <= 65536) or (num_buckets & (num_buckets - 1)):
        raise ValueError("num_buckets must be a power of two in [2, 65536]")
    if seed < 0:
        raise ValueError("seed must be non-negative")
    shift = np.uint64(64 - int(num_buckets).bit_length() + 1)

    def keyed(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError(
                "deterministic_shuffle requires non-negative doc ids"
            )
        k = shuffle_key(ids, seed)
        return pa.table({
            "doc_id": pa.array(ids),
            "key": pa.array(k),
            "_part": pa.array((k >> shift).astype(np.int32)),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    offsets = _bucket_offsets(keyed_ds, num_buckets)

    import ray

    off_ref = ray.put(offsets)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["_part"].iloc[0])
        keys = g["key"].to_numpy(np.uint64)
        order = np.argsort(keys, kind="stable")
        # the key map is bijective, so equal keys == equal doc ids; a
        # duplicate id would make downstream position-attach joins emit
        # corrupt rows — fail loudly here, where detection is free
        # (adjacent equality in the already-sorted bucket)
        srt = keys[order]
        if len(srt) > 1 and np.any(srt[1:] == srt[:-1]):
            dup = g["doc_id"].to_numpy(np.int64)[order][
                1:][srt[1:] == srt[:-1]][0]
            raise ValueError(
                f"deterministic_shuffle: duplicate doc id {dup} — ids must "
                "be unique (dedupe the corpus or re-key before shuffling)"
            )
        pos = np.empty(len(keys), dtype=np.int64)
        pos[order] = ray.get(off_ref)[part] + np.arange(len(keys), dtype=np.int64)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "position": pos,
        })

    return keyed_ds.groupby("_part").map_groups(rank, batch_format="pandas")


def pack_sequences(ds, *, seq_len: int, seed: int = 0,
                   id_col: str = "doc_id", text_col: str = "text",
                   num_buckets: int = 256):
    """Pack the corpus into fixed-capacity training sequences: documents
    are laid out in deterministic-shuffle order as one concatenated token
    stream and chunked every ``seq_len`` tokens; each doc is assigned the
    sequence its FIRST token lands in, plus its offset inside it (a doc
    longer than the remaining room spans into the next sequence — the
    standard concat-then-chunk packing; ``n_tokens`` is emitted so a
    writer can carry the spill).

    Tokens = whitespace-separated words (``count(' ') + 1`` over the
    null-coalesced text — exactly DuckDB's ``len(string_split(text, ' '))``,
    so the oracle is integer-exact).

    Distributed shape — same as ``deterministic_shuffle``, a global
    CUMSUM without a global sort shuffle: order-preserving key-range
    buckets, per-bucket token totals prefix-summed on the driver
    (num_buckets tiny rows), then each bucket independently sorts and
    cumsums locally.  Document payloads never move; the one wide op is
    the groupby on ``_part``, carrying 25 B/row.

    Returns (doc_id, n_tokens, seq_id, seq_offset).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if not (2 <= num_buckets <= 65536) or (num_buckets & (num_buckets - 1)):
        raise ValueError("num_buckets must be a power of two in [2, 65536]")
    if seed < 0:
        raise ValueError("seed must be non-negative")
    shift = np.uint64(64 - int(num_buckets).bit_length() + 1)

    def keyed(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = b[id_col].to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("pack_sequences requires non-negative doc ids")
        k = shuffle_key(ids, seed)
        ntok = pc.add(pc.count_substring(
            pc.coalesce(b[text_col], pa.scalar("", b[text_col].type)), " "
        ), 1)
        return pa.table({
            "doc_id": pa.array(ids),
            "key": pa.array(k),
            "n_tokens": pc.cast(ntok, pa.int64()),
            "_part": pa.array((k >> shift).astype(np.int32)),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    offsets = _bucket_offsets(keyed_ds, num_buckets, "n_tokens")

    import ray

    off_ref = ray.put(offsets)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["_part"].iloc[0])
        keys = g["key"].to_numpy(np.uint64)
        order = np.argsort(keys, kind="stable")
        srt = keys[order]
        if len(srt) > 1 and np.any(srt[1:] == srt[:-1]):
            dup = g["doc_id"].to_numpy(np.int64)[order][
                1:][srt[1:] == srt[:-1]][0]
            raise ValueError(
                f"pack_sequences: duplicate doc id {dup} — ids must be "
                "unique (dedupe the corpus or re-key before packing)"
            )
        ntok = g["n_tokens"].to_numpy(np.int64)[order]
        start = np.empty(len(ntok), dtype=np.int64)
        base = ray.get(off_ref)[part]
        np.cumsum(ntok[:-1], out=start[1:])
        start[0] = 0
        start += base
        out = np.empty(len(ntok), dtype=np.int64)
        out[order] = start
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_tokens": g["n_tokens"].to_numpy(np.int64),
            "seq_id": out // seq_len,
            "seq_offset": out % seq_len,
        })

    return keyed_ds.groupby("_part").map_groups(assign, batch_format="pandas")


def token_budget_select(ds, budgets, *, seed: int = 0,
                        id_col: str = "doc_id", text_col: str = "text",
                        group_col: str = "lang", default_budget: int = 0,
                        num_buckets: int = 256):
    """Fill a per-group TOKEN budget with a seeded-random document sample
    — the data-mixing selector ("take 300B tokens of English, 50B of
    German, ...") a training recipe runs after cleaning.

    Docs are ordered per group by the bijective Weyl key (a seeded
    uniform order) and kept while the group's running token total stays
    within budget; token counts are monotone, so the kept set is a PREFIX
    of the group's ordered stream — deterministic, nested across budgets
    at one seed, and exactly SQL-mirrorable (window cumsum over the
    HUGEINT key order).

    Distributed shape — per-group global cumsum with no sort shuffle:
    order-preserving key-range buckets; per-(group, bucket) token totals
    (a |groups| x num_buckets matrix of tiny rows) prefix-sum on the
    driver; each bucket then sorts its own rows and cumsums locally.
    ``budgets`` is a dict ``{group_value: max_tokens}`` with
    ``default_budget`` for unlisted groups (0 = drop them).

    Returns (id_col, group_col, n_tokens) of the kept docs.
    """
    if not (2 <= num_buckets <= 65536) or (num_buckets & (num_buckets - 1)):
        raise ValueError("num_buckets must be a power of two in [2, 65536]")
    if seed < 0:
        raise ValueError("seed must be non-negative")
    if any(v < 0 for v in budgets.values()) or default_budget < 0:
        raise ValueError("budgets must be non-negative")
    shift = np.uint64(64 - int(num_buckets).bit_length() + 1)

    def keyed(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = b[id_col].to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("token_budget_select requires non-negative ids")
        k = shuffle_key(ids, seed)
        ntok = pc.add(pc.count_substring(
            pc.coalesce(b[text_col], pa.scalar("", b[text_col].type)), " "
        ), 1)
        return pa.table({
            id_col: pa.array(ids),
            group_col: b[group_col],
            "key": pa.array(k),
            "n_tokens": pc.cast(ntok, pa.int64()),
            "_part": pa.array((k >> shift).astype(np.int32)),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # tiny rows: one per (block, group, bucket)
    def per_block(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": b[group_col].to_pandas(),
            "_part": b["_part"].to_numpy(),
            "n": b["n_tokens"].to_numpy(),
        })
        agg = df.groupby(["g", "_part"], sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(
            agg, preserve_index=False
        ).replace_schema_metadata(None)

    totals = keyed_ds.map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    offsets: dict = {}
    if len(totals):
        per = totals.groupby(["g", "_part"])["n"].sum()
        for g, sub in per.groupby(level=0):
            parts = sub.index.get_level_values(1).to_numpy()
            order = np.argsort(parts)
            cum = np.zeros(len(parts), dtype=np.int64)
            np.cumsum(sub.to_numpy()[order][:-1], out=cum[1:])
            for p, c in zip(parts[order], cum):
                offsets[(g, int(p))] = int(c)

    import ray

    off_ref = ray.put(offsets)
    budget_ref = ray.put(dict(budgets))

    def select(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["_part"].iloc[0])
        off = ray.get(off_ref)
        buds = ray.get(budget_ref)
        df = g.sort_values("key", kind="stable")
        cum = df.groupby(group_col, sort=False)["n_tokens"].cumsum()
        off_part = {gv: v for (gv, p), v in off.items() if p == part}
        base = df[group_col].map(off_part).fillna(0).to_numpy(np.int64)
        limit = df[group_col].map(buds).fillna(
            default_budget
        ).to_numpy(np.int64)
        keep = (cum.to_numpy() + base) <= limit
        out = df.loc[keep, [id_col, group_col, "n_tokens"]].sort_values(
            id_col
        )
        # hand back Arrow with an EXPLICIT schema: a fully-filtered
        # bucket would otherwise infer `null` for the group column (and
        # empty object-dtype pandas trips Ray's block size estimator)
        return pa.table({
            id_col: pa.array(out[id_col].to_numpy(np.int64)),
            group_col: pa.array(out[group_col].astype(object),
                                type=pa.string()),
            "n_tokens": pa.array(out["n_tokens"].to_numpy(np.int64)),
        })

    return keyed_ds.groupby("_part").map_groups(select, batch_format="pandas")


def interleave_by_group(ds, *, group_col: str = "source", seed: int = 0,
                        id_col: str = "doc_id", num_buckets: int = 256,
                        round_buckets: int = 256):
    """(doc_id, group, position) — the anti-clumping training order:
    round-robin across groups so no long same-source runs reach the
    trainer.  Round 0 holds one seeded-random doc from EVERY group, then
    round 1, and so on; within a round docs order by their shuffle key.
    Exactly: position = rank of (r, key) where r = rank of key WITHIN
    the doc's group and key is the bijective Weyl map — both ranks
    deterministic, so the order is reproducible across runs/cluster
    sizes and bit-mirrorable in SQL (two nested row_numbers).

    Distributed WITHOUT a global sort and WITHOUT co-locating any group:
      1. within-group rank r: the ``deterministic_shuffle`` trick run
         per group — key-top-bits buckets are order-preserving, so
         per-(group, bucket) counts (tiny: |groups| x num_buckets rows,
         driver prefix-sum, broadcast once) turn each bucket's local
         sort into the exact global within-group rank.  Hub groups
         spread over all buckets instead of landing on one worker.
      2. global rank of (r, key): bucket by min(r, round_buckets-1) —
         monotone in r, hence order-preserving — same counts/offsets
         trick, local sort by (r, key).
    Two key-only shuffles; payloads never move.  Partitioning
    assumption: the distinct-group count is driver-small (sources/langs,
    not urls) — the offsets table is |groups| x num_buckets int64s.

    Tail behavior is inherent to round-robin: once short groups exhaust,
    late rounds hold only the biggest group's docs (a run).  Consumers
    that need a balanced TAIL should cap with ``cap_per_group`` first.
    """
    import ray

    if not (2 <= num_buckets <= 65536) or (num_buckets & (num_buckets - 1)):
        raise ValueError("num_buckets must be a power of two in [2, 65536]")
    if round_buckets < 2:
        raise ValueError("round_buckets must be >= 2")
    if seed < 0:
        raise ValueError("seed must be non-negative")
    shift = np.uint64(64 - int(num_buckets).bit_length() + 1)

    def keyed(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("interleave_by_group requires non-negative ids")
        k = shuffle_key(ids, seed)
        return pa.table({
            "doc_id": pa.array(ids),
            "grp": b[group_col],
            "key": pa.array(k),
            "_part": pa.array((k >> shift).astype(np.int32)),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # per-(group, key-bucket) counts -> per-group exclusive prefix sums
    def gcounts(b: pa.Table) -> pa.Table:
        pdf = pd.DataFrame({"p": b["_part"].to_numpy(),
                            "g": b["grp"].to_pandas()})
        c = pdf.groupby(["g", "p"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(c, preserve_index=False)

    cdf = (keyed_ds.map_batches(gcounts, batch_format="pyarrow",
                                zero_copy_batch=True)
           .to_pandas().groupby(["g", "p"])["n"].sum())
    goffs: dict = {}
    for g in cdf.index.get_level_values(0).unique():
        full = np.zeros(num_buckets, dtype=np.int64)
        s = cdf.loc[g]
        full[s.index.to_numpy()] = s.to_numpy()
        offs = np.zeros(num_buckets, dtype=np.int64)
        np.cumsum(full[:-1], out=offs[1:])
        goffs[g] = offs
    goffs_ref = ray.put(goffs)

    rshift_cap = round_buckets - 1

    def within_rank(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["_part"].iloc[0])
        offs = ray.get(goffs_ref)
        g = g.sort_values(["grp", "key"], kind="stable")
        keys = g["key"].to_numpy(np.uint64)
        # duplicate detection must run on KEY order — in (grp, key) order
        # a duplicate id in two different groups is not adjacent
        ks = np.sort(keys)
        dup = np.flatnonzero(ks[1:] == ks[:-1])
        if len(dup):
            bad = ks[dup[0]]
            raise ValueError(
                f"interleave_by_group: duplicate doc id "
                f"{int(g['doc_id'].to_numpy()[keys == bad][0])} — ids must "
                "be unique"
            )
        local = g.groupby("grp", sort=False).cumcount().to_numpy(np.int64)
        codes, uniques = pd.factorize(g["grp"], sort=False)
        base_arr = np.fromiter((offs[x][part] for x in uniques),
                               dtype=np.int64, count=len(uniques))
        r = base_arr[codes] + local
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "grp": g["grp"].to_numpy(),
            "key": g["key"].to_numpy(np.uint64),
            "r": r,
            "_part2": np.minimum(r, rshift_cap).astype(np.int32),
        })

    ranked = keyed_ds.groupby("_part").map_groups(
        within_rank, batch_format="pandas"
    ).materialize()

    # global offsets over the (monotone-in-r) round buckets
    def rcounts(b: pa.Table) -> pa.Table:
        u, c = np.unique(b["_part2"].to_numpy(), return_counts=True)
        return pa.table({"p": pa.array(u.astype(np.int32)),
                         "n": pa.array(c.astype(np.int64))})

    rdf = (ranked.map_batches(rcounts, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
           .groupby("p")["n"].sum())
    full = np.zeros(round_buckets, dtype=np.int64)
    if len(rdf):
        full[rdf.index.to_numpy()] = rdf.to_numpy()
    roffs = np.zeros(round_buckets, dtype=np.int64)
    np.cumsum(full[:-1], out=roffs[1:])
    roffs_ref = ray.put(roffs)

    def final_rank(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["_part2"].iloc[0])
        order = np.lexsort((g["key"].to_numpy(np.uint64),
                            g["r"].to_numpy(np.int64)))
        pos = np.empty(len(g), dtype=np.int64)
        pos[order] = ray.get(roffs_ref)[part] + np.arange(len(g),
                                                          dtype=np.int64)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            group_col: g["grp"].to_numpy(),
            "position": pos,
        })

    return ranked.groupby("_part2").map_groups(final_rank,
                                               batch_format="pandas")


def split_assign(ds, fractions, *, seed: int = 0, id_col: str = "doc_id",
                 keep_cols: tuple = ()):
    """(doc_id, split) — deterministic train/val/test assignment: the
    doc's Weyl key, as a fraction of 2^64, lands in one of the
    consecutive ``fractions`` intervals.  Map-only (ZERO shuffle),
    reproducible across runs/workers/cluster sizes, exactly mirrorable
    in SQL, and CONSISTENT with ``stratified_sample`` at the same seed
    (a 10% sample drawn with that seed stays inside the same splits).

    ``fractions``: ordered dict/list of (name, fraction); fractions must
    sum to 1 (the last interval absorbs the remainder exactly — cut
    points are computed as cumulative int thresholds so no float
    accumulation can leave a key unassigned).
    """
    if seed < 0:
        raise ValueError("seed must be non-negative")
    names, cuts = split_cuts(fractions)
    names = np.array(names, dtype=object)

    def assign(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("split_assign requires non-negative ids")
        k = shuffle_key(ids, seed)
        idx = split_index(k, cuts)
        cols = {
            id_col: pa.array(ids),
            "split": pa.array(names[idx], type=pa.string()),
        }
        for c in keep_cols:  # pass-through payload (e.g. text for leakage audit)
            cols[c] = b[c]
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def split_cuts(fractions) -> tuple[list, list]:
    """Validate split fractions and return (names, interior cut points as
    PYTHON ints).  Cuts may legitimately equal 2^64 (a trailing zero
    fraction), which does not fit uint64 — that's why they stay Python
    ints; route keys with ``split_index``.  Shared by ``split_assign``,
    ``split_sql_expr`` and the mix pipeline so validation can't drift."""
    items = list(fractions.items()) if isinstance(fractions, dict) else list(fractions)
    if not items:
        raise ValueError("fractions must be non-empty")
    fr = [f for _, f in items]
    if any(f < 0 for f in fr) or abs(sum(fr) - 1.0) > 1e-9:
        raise ValueError("fractions must be non-negative and sum to 1")
    names = [n for n, _ in items]
    cuts = [int(sum(fr[: i + 1]) * 2**64) for i in range(len(fr) - 1)]
    return names, cuts


def split_index(k: np.ndarray, cuts: list) -> np.ndarray:
    """Interval index per uint64 key: idx = #cuts <= key.  A handful of
    vectorized compares (cuts is tiny) instead of searchsorted, because a
    cut of exactly 2^64 overflows uint64 — such a cut compares False for
    every key, exactly matching the SQL ``key < 2^64`` always-true CASE
    arm that precedes it."""
    idx = np.zeros(len(k), dtype=np.int64)
    for cut in cuts:
        if cut >= 2**64:
            continue  # no key reaches it: later intervals get nothing
        idx += (k >= np.uint64(cut)).astype(np.int64)
    return idx


def split_sql_expr(fractions, seed: int, id_col: str = "doc_id") -> str:
    """The DuckDB CASE expression reproducing ``split_assign`` bit-for-bit."""
    names, cuts = split_cuts(fractions)
    key = (f"(CAST({id_col} AS HUGEINT) + {seed}) * {SHUFFLE_MULT} "
           f"% 18446744073709551616")
    clauses = [f"WHEN {key} < {cut} THEN '{names[i]}'"
               for i, cut in enumerate(cuts)]
    return "CASE " + " ".join(clauses) + f" ELSE '{names[-1]}' END"


def pps_sample(ds, *, weight_col: str, w_ref: int, seed: int = 0,
               id_col: str = "doc_id"):
    """Probability-proportional-to-size Bernoulli sample: doc kept with
    probability min(1, weight / w_ref) — the weighted companion of
    ``stratified_sample`` (token-weighted subsampling for corpus stats:
    every TOKEN gets equal inclusion mass, so estimates over the sample
    are token-representative rather than document-representative).

    Decision: ``shuffle_key(doc_id, seed) < floor(weight * 2^64 /
    w_ref)``, with ``weight >= w_ref`` always kept — pure integer
    arithmetic, map-only ZERO shuffle, reproducible anywhere, exactly
    mirrorable in SQL HUGEINT (``pps_sql_predicate``).  Thresholds are
    computed once per DISTINCT weight per batch with Python ints (no
    float rounding), then fanned out with one fancy index.  Same-seed
    samples nest across w_ref values.
    """
    if seed < 0 or w_ref <= 0:
        raise ValueError("seed must be >= 0 and w_ref > 0")

    def keep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("pps_sample requires non-negative ids")
        w = b[weight_col].to_numpy().astype(np.int64)
        if len(w) and w.min() < 0:
            raise ValueError("pps_sample requires non-negative weights")
        k = shuffle_key(ids, seed)
        uw, inv = np.unique(w, return_inverse=True)
        full = uw >= w_ref
        thr = np.zeros(len(uw), dtype=np.uint64)
        for i, x in enumerate(uw):
            if not full[i]:
                thr[i] = (int(x) << 64) // w_ref  # < 2^64 since x < w_ref
        mask = full[inv] | (k < thr[inv])
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def pps_sql_predicate(weight_col: str, w_ref: int, seed: int,
                      id_col: str = "doc_id") -> str:
    """DuckDB predicate reproducing ``pps_sample`` bit-for-bit (HUGEINT
    128-bit arithmetic holds weight * 2^64 for any sane weight)."""
    return (f"({weight_col} >= {w_ref} OR "
            f"(CAST({id_col} AS HUGEINT) + {seed}) * {SHUFFLE_MULT} "
            f"% 18446744073709551616 < "
            f"(CAST({weight_col} AS HUGEINT) * 18446744073709551616) "
            f"// {w_ref})")


def group_split_key(values: np.ndarray) -> np.ndarray:
    """Deterministic int64 key per STRING group value: the first 60 bits
    of md5 (15 hex chars — positive int64 by construction, and exactly
    what DuckDB's ('0x' || substr(md5(v), 1, 15))::BIGINT parses, so the
    SQL mirror is bit-identical).  Hashes each DISTINCT value once per
    batch; nulls key as ''."""
    import hashlib

    uniq, inv = np.unique(np.where(pd.isna(values), "", values).astype(str),
                          return_inverse=True)
    ks = np.array([int(hashlib.md5(u.encode("utf-8")).hexdigest()[:15], 16)
                   for u in uniq], dtype=np.int64)
    return ks[inv]


def split_assign_grouped(ds, fractions, *, seed: int = 0,
                         group_col: str = "site", keep_cols: tuple = ()):
    """GROUP-level train/val/test assignment: every row of one
    ``group_col`` value (host/domain/source) lands in the SAME split —
    the web-corpus split hygiene that stops near-duplicate pages of one
    site from straddling train and test (document-level split_assign
    cannot give this).  Same interval machinery as split_assign, keyed
    on the group's 60-bit md5 key instead of the doc id: map-only, ZERO
    shuffle, reproducible anywhere, exactly SQL-mirrorable
    (``group_split_sql_expr``)."""
    if seed < 0:
        raise ValueError("seed must be non-negative")
    names, cuts = split_cuts(fractions)
    names = np.array(names, dtype=object)

    def assign(b: pa.Table) -> pa.Table:
        vals = b[group_col].to_pandas().to_numpy(dtype=object)
        k = shuffle_key(group_split_key(vals), seed)
        idx = split_index(k, cuts)
        cols = {
            group_col: b[group_col],
            "split": pa.array(names[idx], type=pa.string()),
        }
        for c in keep_cols:
            cols[c] = b[c]
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def group_split_sql_expr(fractions, seed: int, col: str) -> str:
    """The DuckDB CASE expression reproducing ``split_assign_grouped``
    bit-for-bit (md5-prefix group key + the split_sql_expr intervals)."""
    key = f"(('0x' || substr(md5(coalesce({col}, '')), 1, 15))::BIGINT)"
    return split_sql_expr(fractions, seed, id_col=key)


def shard_manifest(ds, *, budget_tokens: int, id_col: str = "doc_id",
                   text_col: str = "text", num_buckets: int = 256):
    """Token-budgeted output-shard plan -> Dataset (shard_id, n_docs,
    n_tokens, first_doc, last_doc — all BIGINT): lay the corpus out in
    doc_id order as one token stream and open a new output shard every
    ``budget_tokens`` tokens; shard(doc) = (tokens BEFORE the doc) //
    budget_tokens — the manifest a resumable partitioned-parquet writer
    consumes (one directory per shard, skip finished shards on restart).

    Tokens = whitespace-separated words (``count(' ') + 1`` over the
    null-coalesced text — exactly DuckDB ``len(string_split(text, ' '))``,
    so the oracle is integer-exact).

    Distributed shape — the pack_sequences global-cumsum pattern with
    doc_id itself as the order key: monotone id-range buckets (any
    monotone map of doc_id is order-preserving; float scaling is fine
    because bucket boundaries only partition, they never reorder),
    per-bucket token totals prefix-summed on the driver (num_buckets tiny
    rows), each bucket independently sorts and cumsums locally, and the
    per-bucket shard rollups merge through ONE shard-keyed reduce (a
    shard can straddle bucket boundaries).  Document payloads collapse to
    16 B/row before anything moves.
    """
    import pyarrow.compute as pc

    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if not (2 <= num_buckets <= 65536):
        raise ValueError("num_buckets must be in [2, 65536]")

    _MANIFEST_COLS = ("shard_id", "n_docs", "n_tokens",
                      "first_doc", "last_doc")

    def _empty() -> pa.Table:
        return pa.table({c: pa.array([], type=pa.int64())
                         for c in _MANIFEST_COLS})

    def keyed(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("shard_manifest requires non-negative doc ids")
        ntok = pc.add(pc.count_substring(
            pc.coalesce(b[text_col], pa.scalar("", b[text_col].type)), " "
        ), 1)
        return pa.table({"doc_id": pa.array(ids),
                         "n_tokens": pc.cast(ntok, pa.int64())})

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    if keyed_ds.count() == 0:
        import ray.data as rd

        return rd.from_arrow(_empty())
    span = int(keyed_ds.max("doc_id")) + 1
    scale = num_buckets / span  # monotone: only partitions, never reorders

    def part(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        p = np.minimum((ids.astype(np.float64) * scale).astype(np.int64),
                       num_buckets - 1)
        return b.append_column("_part", pa.array(p.astype(np.int32)))

    parted = keyed_ds.map_batches(part, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
    offsets = _bucket_offsets(parted, num_buckets, "n_tokens")

    import ray

    off_ref = ray.put(offsets)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy(np.int64)
        order = np.argsort(ids, kind="stable")
        srt = ids[order]
        if len(srt) > 1 and np.any(srt[1:] == srt[:-1]):
            dup = srt[1:][srt[1:] == srt[:-1]][0]
            raise ValueError(
                f"shard_manifest: duplicate doc id {dup} — ids must be "
                "unique (dedupe the corpus or re-key before sharding)"
            )
        ntok = g["n_tokens"].to_numpy(np.int64)[order]
        before = np.empty(len(ntok), dtype=np.int64)
        before[0] = 0
        np.cumsum(ntok[:-1], out=before[1:])
        before += ray.get(off_ref)[int(g["_part"].iloc[0])]
        df = pd.DataFrame({"shard_id": before // budget_tokens,
                           "t": ntok, "d": srt})
        return (df.groupby("shard_id", as_index=False)
                .agg(n_docs=("d", "size"), n_tokens=("t", "sum"),
                     first_doc=("d", "min"), last_doc=("d", "max")))

    rollup = parted.groupby("_part").map_groups(assign,
                                                batch_format="pandas")

    from deduplicator_ray.stages.exact import hash_bucket

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "shard_id" not in df.columns:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in _MANIFEST_COLS})
        g = (df.groupby("shard_id", as_index=False)
             .agg(n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"),
                  first_doc=("first_doc", "min"),
                  last_doc=("last_doc", "max")))
        return g.astype({c: "int64" for c in _MANIFEST_COLS})

    return (hash_bucket(rollup, "shard_id", 16)
            .groupby("_part")
            .map_groups(lambda g: merge(g.drop(columns=["_part"])),
                        batch_format="pandas"))


def sample_k_stratified(ds, k: int, *, seed: int = 0,
                        id_col: str = "doc_id", group_col: str = "lang"):
    """EXACT-k deterministic sample per group -> (id_col, group_col,
    sample_rank BIGINT, 1..k by key order): the k docs with the
    smallest Weyl keys in each group — the fixed-size companion of
    ``stratified_sample`` (Bernoulli rates give binomial-variance
    sizes; an eval-set build wants exactly k per language).

    The Weyl map is a bijection on uint64, so keys are distinct per
    doc id and the rank is total with no tie-break rule needed.
    Distribution: per-block partial top-k per group (<= k x #groups
    rows leave each block), driver merge of the tiny partials — ZERO
    shuffle, reproducible at any parallelism, exactly SQL-mirrorable
    (``sample_k_sql``)."""
    import pandas as pd

    if k < 1:
        raise ValueError("k must be >= 1")

    def partial(b: pa.Table) -> pd.DataFrame:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            id_col: ids,
            group_col: b[group_col].to_pandas(),
            "_key": shuffle_key(ids, seed),
        })
        return (df.sort_values("_key", kind="mergesort")
                .groupby(group_col, sort=False).head(k))

    parts = ds.select_columns([id_col, group_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if parts.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             group_col: pd.Series([], dtype="string"),
                             "sample_rank": pd.Series([], dtype="int64")})
    out = (parts.sort_values("_key", kind="mergesort")
           .groupby(group_col, sort=False).head(k).copy())
    out["sample_rank"] = out.groupby(group_col, sort=False).cumcount() + 1
    out["sample_rank"] = out["sample_rank"].astype("int64")
    return (out.drop(columns=["_key"])
            [[id_col, group_col, "sample_rank"]]
            .reset_index(drop=True))


def sample_k_sql(k: int, seed: int, *, id_col: str = "doc_id",
                 group_col: str = "lang", table: str = "documents") -> str:
    """DuckDB mirror of ``sample_k_stratified`` — same Weyl key, same
    per-group rank."""
    key = (f"(CAST({id_col} AS HUGEINT) + {seed}) * {SHUFFLE_MULT} "
           f"% 18446744073709551616")
    return f"""
WITH keyed AS (
  SELECT {id_col}, {group_col}, {key} AS key FROM {table}
),
ranked AS (
  SELECT {id_col}, {group_col},
         row_number() OVER (PARTITION BY {group_col} ORDER BY key)
           AS sample_rank
  FROM keyed
)
SELECT {id_col}, {group_col}, sample_rank::BIGINT AS sample_rank
FROM ranked WHERE sample_rank <= {k}
"""
