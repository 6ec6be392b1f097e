"""Query catalog: every operator from SURVEY.md §2 as a named query.

Each entry pairs a Spark DataFrame builder with (where SQL-expressible)
an equivalent DuckDB oracle SQL string. The driver's correctness gate
(`__spark_entry__.py`) re-exports this registry.
"""

import glob as _glob
import json as _json
import os as _os
import re as _re

from .registry import QUERIES, Query, query  # noqa: F401

# Importing the modules populates the registry.
from . import core  # noqa: E402,F401
from . import etl  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import ext  # noqa: E402,F401
from . import html  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import dq  # noqa: E402,F401
from . import curation  # noqa: E402,F401


def _check_history() -> tuple[dict[str, int], dict[str, bool]]:
    """Per-query (last round checked, green on that check).

    The driver's correctness harness stops after a fixed number of
    queries per round (50 in r01–r03), so catalog order decides WHICH
    queries get verified each round. The CORRECTNESS_r*.json ledgers
    record what was actually checked and when.
    """
    repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    last_round: dict[str, int] = {}
    last_green: dict[str, bool] = {}
    # Round number comes from the FILENAME, not enumerate() position:
    # a deleted/renamed ledger must not silently renumber later rounds,
    # and the ordering must survive r100 / mixed zero-padding.
    paths = []
    for path in _glob.glob(_os.path.join(repo, "CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", _os.path.basename(path))
        if m:
            paths.append((int(m.group(1)), path))
    for rnd, path in sorted(paths):
        try:
            with open(path) as f:
                rows = _json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            if err == "no_oracle":
                ok = row.get("spark_rows") is not None
            else:
                ok = (
                    err is None
                    and row.get("rows_match") is True
                    and row.get("schema_match") is True
                    and row.get("hash_match") is True
                )
            last_round[name] = rnd
            last_green[name] = bool(ok)
    return last_round, last_green


def _ordered() -> dict[str, Query]:
    """Registry in driver-verification priority order.

    Priority: (1) never-checked queries, (2) queries whose LAST check
    was red — a known failure must re-enter the very next window, not
    wait a full rotation cycle (r06's tokenize_encode crash would
    otherwise stay unverified-fixed until r08), (3) everything else
    oldest-green first. This guarantees every query cycles back
    through the driver's fixed-size window instead of holding a stale
    green forever (the round-3 failure mode: w2/w4 broke while
    carrying an old green from r02, invisible to r03's ledger).
    Registration order breaks remaining ties; a fresh checkout with no
    ledgers degrades to plain registration order.

    Known displacement trade-off: the sibling pull-forward below can
    push the query sitting exactly at the driver's window boundary out
    to the next round. Accepted deliberately — a rows-only entry
    without its adjacent oracle-checked sibling is worthless to the
    ledger, while the displaced query is at worst one round staler and
    rises to the top of the next window by the oldest-green rule.
    """
    last_round, last_green = _check_history()
    reg_pos = {n: i for i, n in enumerate(QUERIES)}

    def key(n):
        if n not in last_round:
            return (0, 0, 0, reg_pos[n])  # never driver-checked
        if not last_green[n]:
            return (0, 1, last_round[n], reg_pos[n])  # red on last check
        return (1, 0, last_round[n], reg_pos[n])  # oldest green first

    base = sorted(QUERIES, key=key)
    # Sibling adjacency: a rows-only query's ledger entry is only
    # meaningful NEXT TO its oracle-checked sibling (portable/pinned
    # variant or accuracy contract), so when one enters the driver's
    # fixed-size window its sibling rides along immediately after it —
    # the ledger then always shows the pair green together instead of
    # splitting them across rotation rounds.
    # The pair anchors at whichever member rotates up FIRST and always
    # emits (rows-only, sibling) in that order.
    pair_of: dict[str, tuple[str, str]] = {}
    for n, q in QUERIES.items():
        if q.sibling is not None and q.sibling in QUERIES:
            for m in (n, q.sibling):
                if m in pair_of:
                    raise ValueError(
                        f"sibling conflict: {m!r} already paired as "
                        f"{pair_of[m]!r}; {n!r} declares sibling "
                        f"{q.sibling!r} — each sibling may anchor one pair"
                    )
            pair_of[n] = (n, q.sibling)
            pair_of[q.sibling] = (n, q.sibling)
    out: list[str] = []
    seen: set[str] = set()
    for n in base:
        if n in seen:
            continue
        for m in pair_of.get(n, (n,)):
            if m not in seen:
                out.append(m)
                seen.add(m)
    return {n: QUERIES[n] for n in out}


def spark_queries():
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sqls():
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}


def headline_queries():
    return {name: q.fn for name, q in QUERIES.items() if q.headline}
