"""Env-driven ETL driver — the reference's `_main` surface
(reference main.py:746-904) over the engine's components.

Config contract kept from the reference:
- `GITHUB_REPOS`: comma-separated `owner/name` list; entries are
  trimmed and empties dropped (C8, main.py:818-824); missing/empty →
  SystemExit, matching the reference's fail-fast.
- `SNAPSHOT_BASE`: warehouse root (the engine's analog of the required
  BIGQUERY_PROJECT/DATASET pair, main.py:781-787) — required.
- `GITHUB_API_URL`: API base override for mocks (main.py:799-801).
- `GITHUB_TOKEN`: bearer token. (The reference's GitHub-App JWT flow is
  connector-internal auth — out of engine scope; a static token covers
  the same surface. Its PEM `\\n`-normalization quirk is kept as
  `normalize_pem`, C7 main.py:773.)
- `SNAPSHOT_DATE`: optional `YYYY-MM-DD`; default = today, computed
  ONCE per run so a run crossing midnight stays consistent
  (main.py:827, docstring main.py:701-703).
"""

from __future__ import annotations

import datetime as _dt
import logging
import os

logger = logging.getLogger("github_etl_spark")


def parse_repos(value: str | None) -> list[str]:
    """C8: split + trim + drop empties; empty result is a config error
    (reference main.py:817-824 exits via SystemExit)."""
    repos = [r.strip() for r in (value or "").split(",") if r.strip()]
    if not repos:
        raise SystemExit("GITHUB_REPOS must list at least one owner/name repo")
    return repos


def normalize_pem(value: str) -> str:
    """C7: env vars flatten newlines — restore literal `\\n` escapes
    (reference main.py:773)."""
    return value.replace("\\n", "\n")


def config_from_env(env: dict | None = None) -> dict:
    env = dict(os.environ if env is None else env)
    base = env.get("SNAPSHOT_BASE")
    if not base:
        raise SystemExit("SNAPSHOT_BASE is required (warehouse root directory)")
    snapshot_date = env.get("SNAPSHOT_DATE") or _dt.date.today().isoformat()
    try:
        _dt.date.fromisoformat(snapshot_date)
    except ValueError:
        raise SystemExit(f"SNAPSHOT_DATE not ISO formatted: {snapshot_date!r}") from None
    return {
        "repos": parse_repos(env.get("GITHUB_REPOS")),
        "sink_base": base,
        "api_url": env.get("GITHUB_API_URL", "https://api.github.com"),
        "token": env.get("GITHUB_TOKEN") or None,
        "snapshot_date": snapshot_date,
        "force": env.get("SNAPSHOT_FORCE", "").lower() in ("1", "true", "yes"),
    }


def main(env: dict | None = None, spark=None) -> int:
    """Full ETL run: one idempotent snapshot per configured repo.

    Returns 0; config errors raise SystemExit like the reference's
    `main()` (main.py:757-761 maps RuntimeError → exit 1 — our errors
    are all config-shaped, so SystemExit directly).
    """
    cfg = config_from_env(env)
    if spark is None:
        from ..session import get_spark

        spark = get_spark("github_etl_spark_cli")
    from ..streaming.pipeline import run_batch

    logger.info("snapshot %s for %d repo(s)", cfg["snapshot_date"], len(cfg["repos"]))
    run_batch(
        spark,
        cfg["repos"],
        cfg["api_url"],
        cfg["sink_base"],
        cfg["snapshot_date"],
        force=cfg["force"],
        token=cfg["token"],
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
