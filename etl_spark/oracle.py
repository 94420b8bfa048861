"""Serial pandas oracle — the executable stand-in for the reference's
final table state (SURVEY.md §0: the reference checkout was empty, so the
north rule's "match the reference's final table state after replay" is
checked against this deterministic, order-independent replay).

Semantics: for every key (repo, path), the event with the highest seq
wins (commit-ordered last-write-wins); if the winner is a delete the key
is absent.  Content is normalized, lang tagged, sha256 fingerprinted with
the pure-Python twins of the engine's vectorized transforms.
"""

from __future__ import annotations

import pandas as pd

from etl_spark.functions.hashing import content_sha256_py
from etl_spark.functions.lang import tag_lang_py
from etl_spark.functions.normalize import normalize_content_py

FINAL_COLUMNS = ["repo", "path", "commit", "lang", "content", "content_sha"]


def replay_events(events: pd.DataFrame, promoted: list[str] | None = None) -> pd.DataFrame:
    """Replay change events serially -> final table state (sorted by key).

    ``events`` needs columns: seq, op, repo, path, commit, lang, content
    (and ``extra`` when ``promoted`` names schema-evolved columns).
    Row order is irrelevant; replay applies strictly in seq order.
    Duplicate seqs (at-least-once delivery) are idempotent by construction.
    """
    promoted = promoted or []
    state: dict[tuple[str, str], dict] = {}
    df = events.sort_values("seq", kind="mergesort")
    has_extra = "extra" in df.columns
    for row in df.itertuples(index=False):
        key = (row.repo, row.path)
        if row.op == "delete":
            state.pop(key, None)
            continue
        content = normalize_content_py(row.content)
        lang = row.lang if isinstance(row.lang, str) else None
        rec = {
            "repo": row.repo,
            "path": row.path,
            "commit": row.commit,
            "lang": tag_lang_py(row.path, content, lang),
            "content": content,
            "content_sha": content_sha256_py(content),
        }
        extra = row.extra if has_extra and isinstance(row.extra, dict) else {}
        for k in promoted:
            rec[k] = extra.get(k)
        state[key] = rec
    out = pd.DataFrame(list(state.values()), columns=FINAL_COLUMNS + promoted)
    return out.sort_values(["repo", "path"], kind="mergesort").reset_index(drop=True)


def state_digest(final: pd.DataFrame) -> str:
    """Order-insensitive digest of a final state (golden-file compares)."""
    import hashlib

    rows = sorted(
        "|".join("" if v is None else str(v) for v in rec)
        for rec in final[FINAL_COLUMNS].itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()
