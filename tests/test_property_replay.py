"""Property-based replay-order invariance (SURVEY.md §5).

For ANY partitioning of the same event set into batches, any batch
order, and any duplicated re-deliveries, the final table state is
identical.  hypothesis drives the batching; the LWW/tombstone merge
must make delivery order irrelevant.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_spark.catalog.table import LakeTable
from etl_spark.fixtures import events_df
from etl_spark.pipeline import canonicalize
from etl_spark.schemas import EVENT_SCHEMA

N_EVENTS = 48


@pytest.fixture(scope="module")
def event_rows(spark):
    # small but adversarial: few keys -> many per-key updates + deletes
    df = events_df(spark, N_EVENTS, seed=11, n_repos=2, paths_per_repo=3, delete_pct=20)
    return [r.asDict(recursive=True) for r in df.collect()]


@pytest.fixture(scope="module")
def baseline_state(spark, event_rows, tmp_path_factory):
    root = tmp_path_factory.mktemp("prop_base")
    t = LakeTable.create(spark, str(root / "t"), n_buckets=4)
    df = spark.createDataFrame(event_rows, EVENT_SCHEMA)
    t.apply_batch(df, 0, delivery="unordered", canonicalizer=canonicalize)
    return sorted(
        tuple(r)
        for r in t.read(include_tombstones=True)
        .select("repo", "path", "commit", "content_sha", "_deleted")
        .collect()
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_any_batching_converges(spark, event_rows, baseline_state, tmp_path_factory, data):
    # random assignment of each event to one of up to 3 batches, plus a
    # random subset re-delivered into a random later-or-same batch
    n_batches = data.draw(st.integers(min_value=1, max_value=3), label="n_batches")
    assign = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=n_batches - 1),
            min_size=N_EVENTS,
            max_size=N_EVENTS,
        ),
        label="assignment",
    )
    dup_mask = data.draw(
        st.lists(st.booleans(), min_size=N_EVENTS, max_size=N_EVENTS), label="dups"
    )

    batches: list[list[dict]] = [[] for _ in range(n_batches)]
    for row, b, dup in zip(event_rows, assign, dup_mask):
        batches[b].append(row)
        if dup:  # re-delivery lands in the LAST batch (worst case)
            batches[n_batches - 1].append(row)

    root = tmp_path_factory.mktemp("prop_run")
    t = LakeTable.create(spark, str(root / "t"), n_buckets=4)
    for bid, rows in enumerate(batches):
        if not rows:
            continue
        df = spark.createDataFrame(rows, EVENT_SCHEMA)
        t.apply_batch(df, bid, delivery="unordered", canonicalizer=canonicalize)

    state = sorted(
        tuple(r)
        for r in t.read(include_tombstones=True)
        .select("repo", "path", "commit", "content_sha", "_deleted")
        .collect()
    )
    assert state == baseline_state


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_mixed_cow_mor_batches_converge_and_changelogs_compose(
    spark, event_rows, baseline_state, tmp_path_factory, data
):
    """Any batching × any per-batch write mode (copy-on-write vs
    merge-on-read) converges to the same state, and for every adjacent
    snapshot pair the changelog reconstructs the next state exactly —
    the two invariants that make MoR safe to mix freely at runtime."""
    from tests.test_changelog import STATE_COLS, _apply_changes

    n_batches = data.draw(st.integers(min_value=1, max_value=3), label="n_batches")
    assign = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=n_batches - 1),
            min_size=N_EVENTS,
            max_size=N_EVENTS,
        ),
        label="assignment",
    )
    modes = data.draw(
        st.lists(
            st.sampled_from(["cow", "mor"]),
            min_size=n_batches,
            max_size=n_batches,
        ),
        label="modes",
    )

    batches: list[list[dict]] = [[] for _ in range(n_batches)]
    for row, b in zip(event_rows, assign):
        batches[b].append(row)

    root = tmp_path_factory.mktemp("prop_mor")
    t = LakeTable.create(
        spark, str(root / "t"), n_buckets=4, mor_compact_ratio=10.0
    )
    versions = [t.snapshot().version]
    for bid, rows in enumerate(batches):
        if not rows:
            continue
        df = spark.createDataFrame(rows, EVENT_SCHEMA)
        t.apply_batch(
            df, bid, delivery="unordered", canonicalizer=canonicalize,
            mode=modes[bid],
        )
        versions.append(t.snapshot().version)

    state = sorted(
        tuple(r)
        for r in t.read(include_tombstones=True)
        .select("repo", "path", "commit", "content_sha", "_deleted")
        .collect()
    )
    assert state == baseline_state

    for va, vb in zip(versions, versions[1:]):
        rebuilt = _apply_changes(t.read(version=va), t.read_changes(va, vb))
        want = t.read(version=vb).select(*STATE_COLS)
        assert rebuilt.exceptAll(want).count() == 0
        assert want.exceptAll(rebuilt).count() == 0
