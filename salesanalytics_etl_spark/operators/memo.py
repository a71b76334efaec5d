"""Registry for the materialize-once memos (banded signatures, IVF cell
assignment / anchors, brute-force top-k ground truth).

THE CONTRACT: every memo keys on ``DataFrame.semanticHash()`` — PLAN
identity, not DATA identity. Within one Spark application, re-reading a
path whose files were overwritten (e.g. after ``merge_upsert_table`` to
the same table) produces the same plan hash, so a cached (checkpointed)
frame from BEFORE the write would be silently served. The memoized
operators therefore assume their inputs are immutable for the lifetime
of the application — true for the registry's query surface (read-only
``sf_dir`` tables) and for any append-only lakehouse layout, but NOT
for in-session read-after-write pipelines.

Such pipelines must call :func:`clear_materialize_memos` after mutating
a table that a memoized operator has already scanned. The memos are
per-process (driver-side dicts), so this is a local, instantaneous
invalidation — the checkpointed blocks are released on GC.
"""

from __future__ import annotations

_MEMOS: list[dict] = []


def register_memo(memo: dict) -> dict:
    """Enroll a module-level memo dict so the global clear can reach it."""
    _MEMOS.append(memo)
    return memo


def clear_materialize_memos() -> int:
    """Invalidate every materialize-once memo; returns entries dropped.

    Call after overwriting a table (merge/compact/swap) that any
    memoized operator — ``minhash_near_dupes_portable``,
    ``lsh_bucket_audit``, ``cosine_topk_ivf_portable``,
    ``portable_cell_assignment_cached``, ``cosine_topk_bruteforce_cached``
    — may have scanned earlier in the session. See the module docstring
    for why ``semanticHash`` cannot detect the overwrite itself.
    """
    dropped = sum(len(m) for m in _MEMOS)
    for m in _MEMOS:
        m.clear()
    return dropped
