"""Commit-file wire protocol for the txlog table format.

One concern, shared by every writer and reader of commit files: make a
TORN commit (the claim-then-write crash window on stores without an
atomic put-if-absent-with-content, ``txlog.TxTable._try_publish``)
*detectable* instead of silently corrupting the log. Local-path
publishes are atomic (tmp + hard link) and can never tear; the
non-local branch claims the version with ``create(overwrite=False)``
and then streams the payload, so a writer dying in between leaves a
claimed version whose file is empty or truncated — the documented
Delta-on-HDFS window (PROTOCOL.md "LogStore" in the public
delta-io/delta repo describes the same store requirement).

The defense is the same count-trailer discipline the checkpoint files
already use (``txlog.py write_checkpoint``): every commit payload ends
with ``{"commit": {"actions": N}}``. Tears are then detectable in all
three forms —

- **empty file** (died right after the claim): zero lines, no trailer;
- **mid-line tear** (died mid-stream): last line fails to JSON-parse;
- **line-boundary tear** (flushed a prefix of whole lines): every
  surviving line parses, but the trailer is gone — which is exactly why
  the trailer is REQUIRED, not optional: a trailer-less commit is
  indistinguishable from a boundary tear, so "legacy acceptance" would
  be a silent-corruption hole. This format owns its files end to end
  (no pre-trailer tables ship anywhere), so strictness costs nothing.

Readers raise :class:`TxCorruption` — loud, naming the repair — rather
than folding a wrong snapshot. Recovery is
``TxTable.repair_torn_commit``: the dead writer's ``_commit`` never
returned, so its actions were never acknowledged, and rewriting the
torn file as an explicit empty commit (trailer-only, ``repaired`` flag)
is the unique history consistent with what callers observed.

Stdlib-only on purpose: the streaming/batch DataSources parse commits
inside executor Python workers (``sources/txlog_stream.py``), where a
pyspark import chain would be dead weight.
"""

from __future__ import annotations

import json
import time

# Bumped when the commit-file wire format changes shape. v2 = the
# required count trailer. Folded into the on-disk artifact cache keys
# (weather star, ANN index) so caches written under an older protocol
# are rebuilt, not rejected.
TXPROTO_VERSION = 2

_TRAILER_KEY = "commit"


class TxCorruption(RuntimeError):
    """A commit file is torn (empty / truncated / trailer mismatch).

    Raised instead of silently folding a wrong snapshot. After
    confirming no writer is in flight for that version, recover with
    ``TxTable.repair_torn_commit(version)``.
    """


def info_action(op: str, **extra) -> dict:
    """Commit provenance (the public Delta commitInfo shape, minimal):
    which operation produced the commit and when. Snapshot/CDC folds
    ignore unknown action keys; ``TxTable.describe_history`` surfaces
    it."""
    return {"info": {"op": op, "ts": round(time.time(), 3), **extra}}


def commit_payload(actions: list[dict]) -> str:
    """Serialize actions + the count trailer as the full commit file
    content. The trailer MUST be produced here (single choke point) so
    every publish path — batch DML, checkpoint-era appends, repairs —
    writes a tear-detectable file."""
    lines = [json.dumps(a, sort_keys=True) for a in actions]
    lines.append(json.dumps({_TRAILER_KEY: {"actions": len(actions)}},
                            sort_keys=True))
    return "\n".join(lines)


def repair_payload() -> str:
    """The canonical no-op commit a repair writes over a torn file:
    trailer-only, flagged for audit. Idempotent — repairing twice
    rewrites identical content."""
    return json.dumps({_TRAILER_KEY: {"actions": 0, "repaired": True}},
                      sort_keys=True)


def parse_commit_lines(raw_lines: list[str], where: str) -> list[dict]:
    """Validate + strip the trailer; return the action list.

    ``where`` names the file in errors (path@version). Raises
    :class:`TxCorruption` on any tear signature; never returns a
    partial action list.
    """
    lines = [ln for ln in raw_lines if ln.strip()]
    if not lines:
        raise TxCorruption(
            f"{where}: commit file is EMPTY — a writer died inside the "
            "claim-then-write window. If no writer is in flight for this "
            "version, run TxTable.repair_torn_commit() to convert it to "
            "an explicit no-op commit.")
    try:
        actions = [json.loads(ln) for ln in lines]
    except ValueError as exc:
        raise TxCorruption(
            f"{where}: commit file is TRUNCATED mid-record ({exc}) — a "
            "writer died inside the claim-then-write window. If no "
            "writer is in flight for this version, run "
            "TxTable.repair_torn_commit().") from exc
    trailer = actions[-1]
    if not (isinstance(trailer, dict) and _TRAILER_KEY in trailer):
        raise TxCorruption(
            f"{where}: commit file has no count trailer — either torn at "
            "a line boundary or written by a pre-v2 writer; both fold to "
            "the same evidence, so it is treated as torn. Repair with "
            "TxTable.repair_torn_commit() (pre-v2 logs: re-create the "
            "table; no shipped artifact predates v2).")
    declared = trailer[_TRAILER_KEY].get("actions")
    if declared != len(actions) - 1:
        raise TxCorruption(
            f"{where}: commit trailer declares {declared} actions but "
            f"{len(actions) - 1} are present — torn or tampered file; "
            "repair with TxTable.repair_torn_commit().")
    return actions[:-1]


def is_torn(raw_lines: list[str]) -> bool:
    """True iff the content shows a tear signature (repair precondition)."""
    try:
        parse_commit_lines(raw_lines, "probe")
    except TxCorruption:
        return True
    return False
