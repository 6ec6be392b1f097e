"""Env-driven driver (etl/cli.py) — config parsing + end-to-end run.

Mirrors the reference's driver behaviors (tests/test_main.py shapes):
required-var SystemExit, repo-list splitting, multi-repo fan-out.
"""

from __future__ import annotations

import pytest

from github_etl_spark.etl.cli import config_from_env, main, normalize_pem, parse_repos
from github_etl_spark.sinks.snapshot import read_snapshot
from tests.mock_github_server import N_PRS, MockGithub


def test_parse_repos_split_trim_drop_empties():
    assert parse_repos("a/b, c/d ,,  ") == ["a/b", "c/d"]


@pytest.mark.parametrize("value", [None, "", " , ,"])
def test_parse_repos_missing_exits(value):
    with pytest.raises(SystemExit):
        parse_repos(value)


def test_normalize_pem():
    assert normalize_pem("-----BEGIN\\nKEY\\n-----") == "-----BEGIN\nKEY\n-----"


def test_config_requires_sink_base():
    with pytest.raises(SystemExit, match="SNAPSHOT_BASE"):
        config_from_env({"GITHUB_REPOS": "a/b"})


def test_config_rejects_bad_date():
    with pytest.raises(SystemExit, match="SNAPSHOT_DATE"):
        config_from_env(
            {"GITHUB_REPOS": "a/b", "SNAPSHOT_BASE": "/x", "SNAPSHOT_DATE": "15-01-2026"}
        )


def test_config_defaults(monkeypatch):
    cfg = config_from_env(
        {"GITHUB_REPOS": "a/b", "SNAPSHOT_BASE": "/x", "SNAPSHOT_DATE": "2026-01-15"}
    )
    assert cfg["api_url"].startswith("https://api.github.com")
    assert cfg["token"] is None and cfg["force"] is False
    assert cfg["snapshot_date"] == "2026-01-15"


def test_main_end_to_end(spark, tmp_path):
    with MockGithub() as mock:
        rc = main(
            env={
                "GITHUB_REPOS": "acme/widgets",
                "SNAPSHOT_BASE": str(tmp_path / "wh"),
                "GITHUB_API_URL": mock.url,
                "SNAPSHOT_DATE": "2026-01-15",
            },
            spark=spark,
        )
    assert rc == 0
    prs = read_snapshot(spark, str(tmp_path / "wh" / "pull_requests"))
    assert prs.count() == N_PRS
    assert str(prs.select("snapshot_date").distinct().collect()[0][0]) == "2026-01-15"


def test_single_command_cli_subprocess(tmp_path):
    """Compose-run parity (reference docker-compose.yml:1-53): ONE
    command — `python -m github_etl_spark.etl.cli` — runs
    connector → transform → idempotent snapshot against the mock API
    in a fresh process (its own SparkSession, config via env) and
    exits 0 with the warehouse populated."""
    import os
    import subprocess
    import sys

    with MockGithub() as mock:
        env = {
            **os.environ,
            "PYTHONPATH": "/root/repo",
            "GITHUB_REPOS": "acme/widgets",
            "SNAPSHOT_BASE": str(tmp_path / "wh"),
            "GITHUB_API_URL": mock.url,
            "SNAPSHOT_DATE": "2026-01-15",
        }
        proc = subprocess.run(
            [sys.executable, "-m", "github_etl_spark.etl.cli"],
            env=env,
            capture_output=True,
            text=True,
            timeout=300,
            cwd=str(tmp_path),  # not the repo root — catches cwd dependence
        )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out_dir = tmp_path / "wh" / "pull_requests"
    assert out_dir.is_dir() and any(out_dir.rglob("*.parquet"))
