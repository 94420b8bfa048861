"""Incremental view maintenance over the lake table's changelog.

``IncrementalView`` keeps a grouped-aggregate table (counts + additive
measures) continuously consistent with a ``LakeTable`` WITHOUT
rescanning it: each ``refresh()`` consumes
``read_changes(last_version, current, include_pre=True)`` and applies
retract/apply deltas —

- insert  → +1 row, +measures(post image)
- delete  → −1 row, −measures(pre image)
- update  → both: retract under the PRE-image group, apply under the
  POST-image group (so views grouped by a mutable column, e.g. ``lang``,
  move rows between groups correctly)

Cost per refresh is proportional to churn (the changelog scans only
rewritten buckets) plus the view's own (small) state — the classic
incremental-view-maintenance contract a 10^10-event table needs for
its downstream rollups.

Exactness: measures should be integer / decimal expressions (counts,
byte lengths, exact sums).  Float measures would drift from a full
recompute by accumulation order — same caveat as every IVM system.

State is a tiny parquet + a ``meta.json`` {last_version, state_dir}
swapped atomically (write-temp + ``os.replace``), so a crashed refresh
leaves the previous consistent state.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_spark.catalog.table import LakeTable
from etl_spark.schemas import KEY_COLUMNS

MeasureFn = Callable[[Callable[[str], Column]], dict[str, Column]]


class IncrementalView:
    def __init__(
        self,
        table: LakeTable,
        root: str,
        group_cols: list[str],
        measures: MeasureFn | None = None,
    ):
        """``measures`` receives a column resolver and returns named
        additive expressions, e.g.::

            lambda c: {"total_chars": F.length(c("content")).cast("long")}

        The resolver binds to the post-image on apply and the pre-image
        on retract — write measures only through it."""
        self.table = table
        self.root = root
        self.group_cols = list(group_cols)
        self.measures = measures or (lambda c: {})
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------------ #
    def _meta_path(self) -> str:
        return os.path.join(self.root, "meta.json")

    def _meta(self) -> dict | None:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _measure_names(self) -> list[str]:
        return sorted(self.measures(lambda name: F.col(name)))

    def read(self) -> DataFrame:
        meta = self._meta()
        if meta is None:
            raise FileNotFoundError("view has never been refreshed")
        return self.table.spark.read.parquet(
            os.path.join(self.root, meta["state_dir"])
        )

    # ------------------------------------------------------------------ #
    def _full_aggregate(self, version: int) -> DataFrame:
        src = self.table.read(version=version)
        m = self.measures(lambda name: F.col(name))
        aggs = [F.count("*").alias("n_rows")] + [
            F.sum(expr).alias(name) for name, expr in sorted(m.items())
        ]
        return src.groupBy(*self.group_cols).agg(*aggs)

    def _delta(self, changes: DataFrame) -> DataFrame:
        post = self.measures(lambda name: F.col(name))
        pre = self.measures(lambda name: F.col(f"pre_{name}"))
        names = sorted(post)

        def group_of(prefix: str) -> list[Column]:
            # key columns are immutable across an update; data columns
            # use their pre_ image on the retract side
            out = []
            for g in self.group_cols:
                col = g if (prefix == "" or g in KEY_COLUMNS) else f"pre_{g}"
                out.append(F.col(col).alias(g))
            return out

        apply_side = changes.filter(
            F.col("change_op").isin("insert", "update")
        ).select(
            *group_of(""),
            F.lit(1).cast("long").alias("_dn"),
            *[post[n].cast("long").alias(n) for n in names],
        )
        retract_side = changes.filter(
            F.col("change_op").isin("delete", "update")
        ).select(
            *group_of("pre_"),
            F.lit(-1).cast("long").alias("_dn"),
            *[(-pre[n].cast("long")).alias(n) for n in names],
        )
        return (
            apply_side.unionByName(retract_side)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("_dn").alias("_dn"),
                *[F.sum(n).alias(n) for n in names],
            )
        )

    def refresh(self) -> dict:
        cur = self.table.snapshot().version
        meta = self._meta()
        names = self._measure_names()
        if meta is not None and meta["last_version"] == cur:
            return {"mode": "noop", "last_version": cur}

        if meta is None:
            new_state = self._full_aggregate(cur)
            mode = "full"
        else:
            changes = self.table.read_changes(
                meta["last_version"], cur, include_pre=True
            )
            delta = self._delta(changes)
            old = self.read().alias("s")
            d = delta.alias("d")
            # NULL-SAFE join on the group key: a nullable group column
            # (e.g. lang) must line its state row up with its delta row —
            # a name-list join would treat NULL != NULL and emit two rows
            cond = None
            for g in self.group_cols:
                term = F.col(f"s.{g}").eqNullSafe(F.col(f"d.{g}"))
                cond = term if cond is None else cond & term
            merged = old.join(d, cond, "full_outer").select(
                *[
                    F.coalesce(F.col(f"s.{g}"), F.col(f"d.{g}")).alias(g)
                    for g in self.group_cols
                ],
                (
                    F.coalesce(F.col("s.n_rows"), F.lit(0))
                    + F.coalesce(F.col("d._dn"), F.lit(0))
                ).alias("n_rows"),
                *[
                    (
                        F.coalesce(F.col(f"s.{n}"), F.lit(0))
                        + F.coalesce(F.col(f"d.{n}"), F.lit(0))
                    ).alias(n)
                    for n in names
                ],
            )
            new_state = merged.filter(F.col("n_rows") > 0)
            mode = "incremental"

        state_dir = f"state-v{cur:08d}-{uuid.uuid4().hex[:8]}"
        new_state.write.mode("overwrite").parquet(
            os.path.join(self.root, state_dir)
        )
        tmp = self._meta_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"last_version": cur, "state_dir": state_dir}, f)
        os.replace(tmp, self._meta_path())
        if meta is not None:  # previous state superseded
            shutil.rmtree(
                os.path.join(self.root, meta["state_dir"]), ignore_errors=True
            )
        return {"mode": mode, "last_version": cur}
