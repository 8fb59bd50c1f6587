"""Reshaping operators: long→wide pivot aggregation.

The reference's report plane is all long-form groupbys (report.py views);
a pivot — one row per entity, one COUNT column per category — is the wide
dual every dashboard eventually asks for, and Ray Data has no native
operator for it. Expressed as a one-hot vectorized `map_batches` with a
PER-BATCH combiner (so the shuffle carries `blocks × distinct row keys`
partial rows, never the corpus) followed by one single-key groupby Sum per
output column.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pivot_counts(
    ds,
    row_col: str,
    col_col: str,
    categories: list[str],
    other_name: str = "other",
):
    """Wide count pivot: one row per `row_col` value, one `n_<category>`
    int64 column per listed category of `col_col`, plus `n_<other_name>`
    catching everything else INCLUDING NULL (SQL `CASE WHEN col = 'x' THEN 1
    ELSE 0 END` treats NULL as not-matching, so NULLs fall through to the
    catch-all on both engines).

    The category list is part of the operator's schema contract (a pivot's
    columns must be known up front — discover them with a distinct pass if
    needed); it is small and ships inside the function closure, never per
    batch. Scale shape: vectorized one-hot + per-batch pandas combine →
    partial rows bounded by blocks × |row keys|, then the bucketed pandas
    reduce (row keys are 'one per entity', i.e. corpus-cardinality — the
    sort-based groupby().aggregate() finish is out per the CLAUDE.md
    reduction invariant)."""
    from .assembly import bucketed_reduce_per_key

    cats = list(categories)
    if not cats:
        raise ValueError(
            "pivot_counts requires at least one category (the column "
            "contract must be known up front; discover categories with a "
            "distinct pass if needed)"
        )
    out_cols = [f"n_{c}" for c in cats] + [f"n_{other_name}"]

    def onehot_combine(t: pa.Table) -> pd.DataFrame:
        cols = {row_col: t[row_col].to_pandas()}
        known = None
        for c in cats:
            m = pc.fill_null(pc.equal(t[col_col], c), False)
            cols[f"n_{c}"] = pc.cast(m, pa.int64()).to_pandas()
            known = m if known is None else pc.or_(known, m)
        cols[f"n_{other_name}"] = pc.cast(pc.invert(known), pa.int64()).to_pandas()
        df = pd.DataFrame(cols)
        # per-batch combiner: the shuffle sees one partial row per
        # (block, row key), not one per input row
        return df.groupby(row_col, sort=False, dropna=False).sum().reset_index()

    onehot_combine.__name__ = "pivot_onehot_combine"
    return bucketed_reduce_per_key(
        ds.select_columns([row_col, col_col]).map_batches(
            onehot_combine, batch_format="pyarrow"
        ),
        row_col,
        [(c, c, "sum") for c in out_cols],
        dropna=False,  # NULL row keys stay a group, like the old combiner
    )
