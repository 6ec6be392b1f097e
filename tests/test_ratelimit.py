"""Driver-coordinated rate budget (sources/ratelimit.py)."""

from __future__ import annotations

import threading
import time

from github_etl_spark.sources.ratelimit import (
    BudgetClient,
    TokenBucket,
    TokenBucketServer,
)
from github_etl_spark.sources.github import GithubPullsReader
from tests.mock_github_server import N_PRS, MockGithub


def test_bucket_math_with_fake_clock():
    clock = {"t": 0.0}
    b = TokenBucket(rate=2.0, capacity=4.0, clock=lambda: clock["t"])
    # Burst drains the full capacity immediately.
    assert [b.try_acquire() for _ in range(4)] == [0.0] * 4
    # Empty: next permit is half a second of refill away.
    assert abs(b.try_acquire() - 0.5) < 1e-9
    # Refill restores permits over time, capped at capacity.
    clock["t"] = 10.0
    assert [b.try_acquire() for _ in range(4)] == [0.0] * 4
    assert b.try_acquire() > 0.0


def test_server_smooths_a_stampede():
    srv = TokenBucketServer(requests_per_hour=3600 * 4, burst=2)  # 4/s, burst 2
    try:
        client = srv.client("127.0.0.1")
        t0 = time.monotonic()
        threads = [threading.Thread(target=client.acquire) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.monotonic() - t0
        # 8 permits at 4/s with burst 2 → ~1.5 s of shaping; generous
        # lower bound to stay timing-robust.
        assert elapsed >= 1.0, elapsed
    finally:
        srv.close()


def test_budget_client_fails_open_when_server_gone():
    srv = TokenBucketServer(requests_per_hour=3600)
    url = srv.url_for("127.0.0.1")
    secret = srv.secret
    srv.close()
    t0 = time.monotonic()
    BudgetClient(url, secret).acquire()  # must not raise or hang
    assert time.monotonic() - t0 < 5.0


def test_acquire_requires_shared_secret():
    """A peer that merely reaches the port (no secret) gets 403 and
    drains nothing; the secret-bearing client still gets permits."""
    import urllib.error
    import urllib.request

    srv = TokenBucketServer(requests_per_hour=3600, burst=1)
    try:
        url = srv.url_for("127.0.0.1")
        try:
            urllib.request.urlopen(url + "/acquire", timeout=5)
            assert False, "unauthenticated acquire should 403"
        except urllib.error.HTTPError as e:
            assert e.code == 403
        try:
            urllib.request.urlopen(url + "/acquire?s=wrong", timeout=5)
            assert False, "wrong secret should 403"
        except urllib.error.HTTPError as e:
            assert e.code == 403
        # Budget untouched by the rejected calls: the real client gets
        # the single burst permit immediately.
        t0 = time.monotonic()
        srv.client("127.0.0.1").acquire()
        assert time.monotonic() - t0 < 1.0
    finally:
        srv.close()


def test_server_binds_loopback_by_default():
    srv = TokenBucketServer(requests_per_hour=3600)
    try:
        assert srv.server.server_address[0] == "127.0.0.1"
    finally:
        srv.close()


def test_reader_budget_servers_are_reused_and_closeable():
    from github_etl_spark.sources.github import (
        _BUDGET_SERVERS,
        close_budget_servers,
    )

    close_budget_servers()
    with MockGithub() as mock:
        opts = {
            "repo": "acme/widgets",
            "url": mock.url,
            "with_children": "false",
            "requests_per_hour": "3600000",
        }
        GithubPullsReader(opts)
        GithubPullsReader(opts)
        GithubPullsReader({**opts, "requests_per_hour": "7200000"})
        # Same budget → same server; different budget → its own server.
        assert len(_BUDGET_SERVERS) == 2
    close_budget_servers()
    assert len(_BUDGET_SERVERS) == 0


def test_reader_with_budget_reads_everything(spark):
    with MockGithub() as mock:
        r = GithubPullsReader(
            {
                "repo": "acme/widgets",
                "url": mock.url,
                "per_page": "100",
                "with_children": "false",
                # Generous budget: shaping must not lose rows.
                "requests_per_hour": "3600000",
            }
        )
        [part] = r.partitions()
        rows = list(r.read(part))
        assert len(rows) == N_PRS
        assert r.client.budget is not None
