"""End-to-end training-data MIXING pipeline + CLI — the recipe step that
turns a cleaned corpus into a training order:

    python -m deduplicator_ray.pipelines.mix_pipeline \
        --corpus /path/docs_parquet --out /tmp/mix_out \
        [--rates en=0.5,de=1.0 --default-rate 0.25 --seed-sample 7] \
        [--max-per-source 1000 --seed-cap 5] \
        [--budgets en=50000,de=20000 --default-budget 10000 --seed-budget 21] \
        [--seed-order 9] [--seq-len 2048] \
        [--splits train=0.9,val=0.05,test=0.05 --seed-split 3] [--force]

Stages (each a resumable checkpoint under --out, chained config hashes —
changing a late knob, e.g. --seed-order, recomputes ONLY from that
stage; see state/checkpoint.py):

    sampled     per-language Bernoulli rates (stages/shuffle.py:
                stratified_sample) — map-only, zero shuffle
    capped      per-source document cap (stages/freq.py:cap_per_group) —
                the hub-domain damper; the kept-id set is bounded by
                max_per_source x |sources| and broadcasts once
    budgeted    per-language token budgets (stages/shuffle.py:
                token_budget_select) — bucketed cumsum, no sort shuffle
    mixed       source-interleaved training order (stages/shuffle.py:
                interleave_by_group), token-packing over THAT order
                (same bucketed-cumsum trick keyed on the dense
                position), and deterministic train/val/test assignment
                (split_assign) — the stage output IS the training
                manifest (doc_id, lang, source, text, n_tokens,
                position, seq_id, seq_offset, split), partitioned
                parquet

Every decision is a pure function of (doc_id, seed): the whole recipe is
reproducible across runs and cluster sizes, nested across rates, and
exactly SQL-mirrorable — the driver-checked queries (corpus_sample,
cap_per_group, token_budget, interleave_sources, pack_sequences,
split_assign) pin each stage's semantics independently.

Scale notes: the only driver-side materializations are the capped-id set
(bounded by construction) and the budget/position attach tables, both of
which broadcast up to --max-broadcast and fall back to a hash-bucket
co-partition join beyond it; document text never rides a shuffle.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa

from deduplicator_ray.state.checkpoint import (
    StageCheckpoint,
    input_fingerprint,
    run_stage,
)


def _parse_kv(spec: str, cast):
    out = {}
    for item in spec.split(","):
        if not item:
            continue
        k, _, v = item.partition("=")
        if not _ or not k:
            raise ValueError(f"bad key=value item {item!r}")
        out[k] = cast(v)
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Ray-Data-native data mixing")
    p.add_argument("--corpus", required=True,
                   help="docs table: (doc_id, lang, source, text)")
    p.add_argument("--out", required=True, help="output/checkpoint root")
    p.add_argument("--rates", default="",
                   help="per-lang sample rates, e.g. en=0.5,de=1.0 "
                        "(empty = keep all)")
    p.add_argument("--default-rate", type=float, default=1.0)
    p.add_argument("--seed-sample", type=int, default=7)
    p.add_argument("--max-per-source", type=int, default=0,
                   help="per-source doc cap (0 = off)")
    p.add_argument("--seed-cap", type=int, default=5)
    p.add_argument("--budgets", default="",
                   help="per-lang token budgets, e.g. en=50000,de=20000 "
                        "(empty = off)")
    p.add_argument("--default-budget", type=int, default=0)
    p.add_argument("--seed-budget", type=int, default=21)
    p.add_argument("--seed-order", type=int, default=9)
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--splits", default="train=0.9,val=0.05,test=0.05")
    p.add_argument("--seed-split", type=int, default=3)
    p.add_argument("--max-broadcast", type=int, default=2_000_000)
    p.add_argument("--force", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only when this process owns ray.init")
    return p


def keep_ids(ds, ids: np.ndarray, *, key_col: str = "doc_id",
             max_broadcast: int = 2_000_000, num_buckets: int = 64):
    """Semi-join: keep only rows whose ``key_col`` is in ``ids`` —
    broadcast filter up to the cap, hash-bucket co-partition beyond
    (the mirror of clean_pipeline.drop_ids)."""
    import ray

    if not isinstance(ids, np.ndarray):  # a Dataset of ids: decide how to
        ids = ids.materialize()          # ship WITHOUT an unconditional
        n_ids = ids.count()              # driver collection
        if n_ids <= max_broadcast:
            ids = ids.to_pandas()[key_col].to_numpy(np.int64)
        else:
            return _keep_ids_copartition(ds, ids, key_col=key_col,
                                         num_buckets=num_buckets)
    ids = np.sort(np.asarray(ids, dtype=np.int64))
    if len(ids) <= max_broadcast:
        ref = ray.put(ids)

        def f(b: pa.Table) -> pa.Table:
            k = b[key_col].to_numpy().astype(np.int64)
            keep = ray.get(ref)
            if not len(k):
                return b
            if not len(keep):
                return b.slice(0, 0)
            from deduplicator_ray.util import isin_sorted

            return b.filter(pa.array(isin_sorted(keep, k)))

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    import ray.data as rd

    id_ds = rd.from_arrow(pa.table({key_col: pa.array(ids)}))
    return _keep_ids_copartition(ds, id_ds, key_col=key_col,
                                 num_buckets=num_buckets)


def _keep_ids_copartition(ds, id_ds, *, key_col: str, num_buckets: int):
    """Semi-join by hash-bucket co-partition: one key shuffle of both
    sides, Arrow-native per-bucket reduce; the id side never touches the
    driver."""
    from deduplicator_ray.stages.exact import hash_bucket

    id_ds = id_ds.select_columns([key_col])

    def tag(src: int):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                "_src", pa.array(np.full(b.num_rows, src, dtype=np.int8))
            )
        return f

    both = ds.map_batches(tag(0), batch_format="pyarrow",
                          zero_copy_batch=True).union(
        id_ds.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )
    both = hash_bucket(both, key_col, num_buckets)

    def semi(g: pa.Table) -> pa.Table:
        # Arrow-native reduce: the union null-padded the id side's missing
        # columns, and a pandas round-trip would promote nullable int64
        # data columns to float64 — keep the block in Arrow throughout
        src = g["_src"].to_numpy(zero_copy_only=False)
        keys = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.sort(keys[src == 1])
        mask = np.zeros(len(keys), dtype=bool)
        rows = np.flatnonzero(src == 0)
        if len(keep) and len(rows):
            pos = np.searchsorted(keep, keys[rows])
            mask[rows] = (pos < len(keep)) & (
                keep[np.minimum(pos, len(keep) - 1)] == keys[rows]
            )
        out = g.filter(pa.array(mask))
        return out.drop_columns(["_src", "_part"])

    return both.groupby("_part").map_groups(semi, batch_format="pyarrow")


def _pack_by_position(ds, *, seq_len: int, n_docs: int,
                      group_col: str | None = None,
                      num_buckets: int = 256):
    """Token packing over the INTERLEAVED order: same bucketed global
    cumsum as ``pack_sequences`` (stages/shuffle.py) but keyed on the
    dense ``position`` column — bucket = position * B // n_docs is
    order-preserving because positions are a 0..n-1 permutation.

    With ``group_col`` (the split label) the cumsum runs PER GROUP —
    per-(group, bucket) token totals prefix-sum on the driver, the same
    trick interleave_by_group uses — so sequences never straddle a
    train/val/test boundary and each group numbers its sequences from 0.
    Input needs (position, n_tokens[, group_col]); appends
    (seq_id, seq_offset)."""
    import pandas as pd
    import ray

    if n_docs <= 0:
        return ds.map_batches(
            lambda b: b.append_column(
                "seq_id", pa.array(np.empty(0, np.int64))
            ).append_column("seq_offset", pa.array(np.empty(0, np.int64))),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    B = int(num_buckets)

    def keyed(b: pa.Table) -> pa.Table:
        pos = b["position"].to_numpy().astype(np.int64)
        part = (pos * B // n_docs).astype(np.int32)
        return b.append_column("_part", pa.array(part))

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # per-(group, bucket) token totals -> per-group exclusive prefix sums
    def gcounts(b: pa.Table) -> pa.Table:
        pdf = pd.DataFrame({
            "p": b["_part"].to_numpy(),
            "g": (b[group_col].to_pandas() if group_col
                  else np.zeros(b.num_rows, dtype=np.int8)),
            "n": b["n_tokens"].to_numpy(),
        })
        c = pdf.groupby(["g", "p"], sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(c, preserve_index=False)

    cdf = (keyed_ds.map_batches(gcounts, batch_format="pyarrow",
                                zero_copy_batch=True)
           .to_pandas().groupby(["g", "p"])["n"].sum())
    goffs: dict = {}
    for g in cdf.index.get_level_values(0).unique():
        full = np.zeros(B, dtype=np.int64)
        s = cdf.loc[g]
        full[s.index.to_numpy()] = s.to_numpy()
        offs = np.zeros(B, dtype=np.int64)
        np.cumsum(full[:-1], out=offs[1:])
        goffs[g] = offs
    off_ref = ray.put(goffs)

    def assign(g):
        part = int(g["_part"].iloc[0])
        offs = ray.get(off_ref)
        g = g.sort_values("position", kind="stable")
        grp = (g[group_col] if group_col
               else pd.Series(np.zeros(len(g), dtype=np.int8), index=g.index))
        ntok = g["n_tokens"].to_numpy(np.int64)
        # per-group running start within the bucket + per-group base
        cum = pd.Series(ntok, index=g.index).groupby(
            grp.to_numpy(), sort=False).cumsum().to_numpy(np.int64) - ntok
        codes, uniques = pd.factorize(grp, sort=False)
        base = np.fromiter((offs[x][part] for x in uniques),
                           dtype=np.int64, count=len(uniques))[codes]
        start = base + cum
        res = g.drop(columns=["_part"]).copy()
        res["seq_id"] = start // seq_len
        res["seq_offset"] = start % seq_len
        return pd.DataFrame(res)

    return keyed_ds.groupby("_part").map_groups(assign, batch_format="pandas")


def run(args) -> dict:
    import ray

    import ray.data as rd

    from deduplicator_ray.stages.freq import cap_per_group
    from deduplicator_ray.stages.joins import hash_join
    from deduplicator_ray.stages.shuffle import (
        interleave_by_group,
        split_assign,
        stratified_sample,
        token_budget_select,
    )

    from deduplicator_ray.stages.shuffle import split_cuts

    rates = _parse_kv(args.rates, float)
    budgets = _parse_kv(args.budgets, int)
    splits = list(_parse_kv(args.splits, float).items())
    split_cuts(splits)  # validate BEFORE any stage burns compute
    if args.seq_len <= 0:
        raise ValueError("--seq-len must be positive")

    h_sample = "|".join(str(x) for x in (
        "mix-sample", sorted(rates.items()), args.default_rate,
        args.seed_sample,
    ))
    h_cap = "|".join(str(x) for x in (
        h_sample, "cap", args.max_per_source, args.seed_cap,
    ))
    h_budget = "|".join(str(x) for x in (
        h_cap, "budget", sorted(budgets.items()), args.default_budget,
        args.seed_budget,
    ))
    h_mixed = "|".join(str(x) for x in (
        h_budget, "mix", args.seed_order, args.seq_len, splits,
        args.seed_split,
    ))
    fp = input_fingerprint(args.corpus)
    out = args.out
    os.makedirs(out, exist_ok=True)

    raw = rd.read_parquet(args.corpus,
                          columns=["doc_id", "lang", "source", "text"])
    report: dict = {
        "config_hash": h_mixed,
        "input_docs": raw.count(),
        "resumed_stages": [],
    }

    def stage(name, chash, build):
        ck = StageCheckpoint(out, name, config_hash=chash,
                             input_fingerprint=fp)
        ds, m, skipped = run_stage(ck, build, force=args.force)
        if skipped:
            report["resumed_stages"].append(name)
        return ds, m

    # -- stage 1: per-language sampling ---------------------------------
    if rates or args.default_rate < 1.0:
        docs, m = stage("sampled", h_sample, lambda: stratified_sample(
            raw, rates if rates else args.default_rate,
            seed=args.seed_sample,
            group_col="lang" if rates else None,
            default_rate=args.default_rate,
        ))
        report["after_sample"] = m["total_rows"]
    else:
        docs = raw
        report["after_sample"] = report["input_docs"]

    # -- stage 2: per-source cap -----------------------------------------
    if args.max_per_source > 0:
        def build_capped():
            kept = cap_per_group(
                docs.select_columns(["doc_id", "source"]),
                group_col="source", max_per_group=args.max_per_source,
                seed=args.seed_cap,
            )
            # kept ids are bounded by cap x |sources| — driver-small
            ids = kept.to_pandas()["doc_id"].to_numpy(np.int64)
            return keep_ids(docs, ids, max_broadcast=args.max_broadcast)

        docs, m = stage("capped", h_cap, build_capped)
        report["after_cap"] = m["total_rows"]
    else:
        report["after_cap"] = report["after_sample"]

    # -- stage 3: per-language token budgets ------------------------------
    if budgets or args.default_budget > 0:
        def build_budgeted():
            sel = token_budget_select(
                docs.select_columns(["doc_id", "text", "lang"]),
                budgets, seed=args.seed_budget,
                default_budget=args.default_budget,
            )
            # the budget-selected set can be MOST of the corpus (generous
            # budgets) — hand keep_ids the Dataset so it only collects to
            # the driver when the count fits --max-broadcast
            return keep_ids(docs, sel, max_broadcast=args.max_broadcast)

        docs, m = stage("budgeted", h_budget, build_budgeted)
        report["after_budget"] = m["total_rows"]
    else:
        report["after_budget"] = report["after_cap"]

    # -- stage 4: interleave + pack + split = the training manifest -------
    n_docs = report["after_budget"]

    def build_mixed():
        import pyarrow.compute as pc

        pos = interleave_by_group(
            docs.select_columns(["doc_id", "source"]),
            group_col="source", seed=args.seed_order,
        ).map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"],
                                "position": b["position"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        # position table is 16 B/doc: broadcast-attach up to the cap,
        # co-partition hash join beyond
        if n_docs <= args.max_broadcast:
            pdf = pos.to_pandas().sort_values("doc_id")
            ids_ref = ray.put(pdf["doc_id"].to_numpy(np.int64))
            pos_ref = ray.put(pdf["position"].to_numpy(np.int64))

            def attach(b: pa.Table) -> pa.Table:
                k = b["doc_id"].to_numpy().astype(np.int64)
                ids, p = ray.get(ids_ref), ray.get(pos_ref)
                idx = np.searchsorted(ids, k)
                return b.append_column("position", pa.array(p[idx]))

            ordered = docs.map_batches(attach, batch_format="pyarrow",
                                       zero_copy_batch=True)
        else:
            from deduplicator_ray.util import auto_partitions

            ordered = hash_join(
                docs, pos, on=("doc_id",),
                num_partitions=auto_partitions(),
                out_schema={"doc_id": pa.int64(), "lang": pa.string(),
                            "source": pa.string(), "text": pa.string(),
                            "position": pa.int64()},
            )

        def with_ntok(b: pa.Table) -> pa.Table:
            ntok = pc.add(pc.count_substring(
                pc.coalesce(b["text"], pa.scalar("", b["text"].type)), " "
            ), 1)
            return b.append_column("n_tokens", pc.cast(ntok, pa.int64()))

        ordered = ordered.map_batches(with_ntok, batch_format="pyarrow",
                                      zero_copy_batch=True)
        # split BEFORE packing, then pack per split: sequences must never
        # straddle a train/val/test boundary (a consumer reconstructing
        # split=='train' sequences by (seq_id, seq_offset) would otherwise
        # see token-range holes and cross-split seq_id sharing).  Split is
        # a pure key function of doc_id — computed map-side with the SAME
        # validated arithmetic split_assign pins (shuffle.split_cuts).
        from deduplicator_ray.stages.shuffle import (
            shuffle_key,
            split_cuts,
            split_index,
        )

        split_names, cuts = split_cuts(splits)
        names = np.array(split_names, dtype=object)

        def add_split(b: pa.Table) -> pa.Table:
            k = shuffle_key(b["doc_id"].to_numpy().astype(np.int64),
                            args.seed_split)
            return b.append_column(
                "split", pa.array(names[split_index(k, cuts)],
                                  type=pa.string()))

        labeled = ordered.map_batches(add_split, batch_format="pyarrow",
                                      zero_copy_batch=True)
        return _pack_by_position(labeled, seq_len=args.seq_len,
                                 n_docs=n_docs, group_col="split")

    final_ds, m = stage("mixed", h_mixed, build_mixed)
    report["output_docs"] = m["total_rows"]
    report["output_dir"] = os.path.join(out, "mixed", "data")

    with open(os.path.join(out, "REPORT.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    return report


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    import ray

    if not ray.is_initialized():  # the driver may own the session
        kw = {"include_dashboard": False}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)
    return run(args)


if __name__ == "__main__":
    r = main()
    print(json.dumps(r, indent=2, sort_keys=True))
