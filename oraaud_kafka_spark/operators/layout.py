"""Layout advisor: profile → choose z-order columns → write → prove
skipping — the end-to-end table-maintenance loop a 100 TB lakehouse
runs before committing to a physical layout.

Pieces already shipped separately: `queries.reshape.profile_approx`
(one-scan HLL++ column profile, no Expand) and
`sources.tabular.zorder_write` (Morton-curve clustering so BOTH layout
columns' per-file min/max stats turn selective). This module wires
them: the advisor ranks candidate columns by approximate distinct
cardinality from ONE profiling scan, z-orders the table on the top
two, and the skipping report reads the written parquet footers to
show what fraction of files a range predicate can prune — the
evidence the layout change paid off, produced without scanning data.

Scale notes: the profile is one ordinary hash aggregate over the
table (the sketch state is KB-sized per column) and its min/max feed
the probe ranges directly — the demo never re-scans the table for
bounds it already has. The write is one range exchange; the footer
audit walks file METADATA only (drive it from the cluster's
catalog/manifest at real scale — at 100 TB the file listing itself is
metadata-service work, not a local os.walk). Column choice by
cardinality is the standard first-order heuristic (Delta OPTIMIZE
ZORDER BY guidance: high-cardinality columns used in selective
predicates); feed observed query predicates instead when a workload
log exists.
"""

from __future__ import annotations

import glob
import numbers
import os

from pyspark.sql import DataFrame


def _profile(df: DataFrame, candidates: tuple[str, ...], rsd: float):
    """One profiling scan → (ranked [(col, approx_distinct)], per-col
    stats {col: (n_nonnull, min, max)})."""
    from ..queries.reshape import profile_approx

    from ..tables import note_data_computed

    note_data_computed()  # profiling scan at build time: no memo
    row = profile_approx(df, candidates, rsd=rsd).first()
    ranked = sorted(
        ((c, int(row[f"{c}__ad"])) for c in candidates),
        key=lambda t: (-t[1], t[0]),
    )
    stats = {
        c: (row[f"{c}__n"], row[f"{c}__min"], row[f"{c}__max"])
        for c in candidates
    }
    return ranked, stats


def advise_zorder_columns(
    df: DataFrame, candidates: tuple[str, ...], *, rsd: float = 0.02
) -> list[tuple[str, int]]:
    """Rank ``candidates`` by approximate distinct cardinality (one
    HLL++ profiling scan, no Expand) — descending, ties broken by
    name for determinism. The top two are the z-order pair: clustering
    pays off where per-file value ranges can actually narrow, i.e. on
    high-cardinality columns; a 3-value column's min/max spans the
    domain in every file no matter the layout."""
    ranked, _ = _profile(df, candidates, rsd)
    return ranked


def advise_and_layout(
    df: DataFrame,
    path: str,
    candidates: tuple[str, ...],
    *,
    n_files: int = 8,
    rsd: float = 0.02,
    mode: str = "error",
) -> dict:
    """Profile ``candidates``, z-order ``df`` into ``path`` on the two
    highest-cardinality ones, and return the advisory report (ranking
    plus the profile's per-column non-null count and min/max, so
    downstream probes never re-scan the table)."""
    from ..sources.tabular import zorder_write

    if len(candidates) < 2:
        raise ValueError("need at least two candidate columns to z-order")
    ranked, stats = _profile(df, candidates, rsd)
    if all(stats[c][0] == 0 for c in candidates):
        raise ValueError(
            "table is empty (all candidate columns have zero non-null "
            "rows) — nothing to lay out"
        )
    chosen = (ranked[0][0], ranked[1][0])
    zorder_write(df, path, chosen, n_files=n_files, mode=mode)
    return {
        "chosen": chosen,
        "ranked": ranked,
        "col_stats": stats,
        "n_files": n_files,
    }


def skipping_report(path: str, col: str, lo, hi) -> dict:
    """Footer-stats audit: of the parquet files under ``path``, how many
    could a scan with predicate ``lo <= col <= hi`` skip? Reads row-group
    METADATA only (pyarrow), no data pages. A file survives if any of
    its row groups' [min, max] intersects [lo, hi] — the same test
    parquet readers and table-format manifests apply. Raises if ``col``
    appears in no file's schema: an absent column would otherwise count
    every file as skippable and report trivially perfect pruning for a
    typo. Returns total vs candidate file counts; skipped = total -
    candidates."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    n_candidates = 0
    col_seen = False
    for f in files:
        md = pq.ParquetFile(f).metadata
        hit = False
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                if c.path_in_schema == col:
                    col_seen = True
                    st = c.statistics
                    if st is None or st.min is None:
                        hit = True  # no stats: cannot skip
                    elif st.min <= hi and st.max >= lo:
                        hit = True
            if hit:
                break
        n_candidates += hit
    if files and not col_seen:
        raise ValueError(
            f"column {col!r} not present in any parquet file under "
            f"{path!r} — a skipping report for an absent column would "
            "be trivially (and misleadingly) perfect"
        )
    return {
        "col": col,
        "n_files_total": len(files),
        "n_files_candidate": n_candidates,
        "n_files_skipped": len(files) - n_candidates,
    }


def layout_advisor_demo(
    df: DataFrame, path: str,
    candidates: tuple[str, ...],
    *, n_files: int = 8,
) -> dict:
    """The full loop: advise → write → prove. For each chosen NUMERIC
    column, probes a range predicate spanning ~1/n_files of its value
    domain (bounds straight from the profiling scan — no re-scan) and
    reports how many files its footer stats admit. On a well-clustered
    layout both probes skip most files; on a plain (unclustered) write
    they skip ~none — that delta is the advisor's receipt. Non-numeric
    or constant chosen columns record why their probe was skipped
    instead of crashing on range arithmetic."""
    report = advise_and_layout(df, path, candidates, n_files=n_files)
    probes = {}
    for c in report["chosen"]:
        _, lo_all, hi_all = report["col_stats"][c]
        if not (
            isinstance(lo_all, numbers.Number)
            and isinstance(hi_all, numbers.Number)
        ):
            probes[c] = {"skipped_probe": "non-numeric or all-NULL column"}
            continue
        if hi_all <= lo_all:
            probes[c] = {"skipped_probe": "constant column — no range"}
            continue
        width = (hi_all - lo_all) / n_files
        probes[c] = skipping_report(path, c, lo_all, lo_all + width)
    report["probes"] = probes
    return report
