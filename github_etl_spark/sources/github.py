"""GitHub REST connector — Spark 4 Python Data Source (SURVEY.md §2.1
S1-S5, §2.9 T2-T3, §7.1 M3).

The reference scans PRs with a serial Link-header walk
(main.py:176-271), throttles on the rate-limit headers
(main.py:380-423), and N+1-fetches children per PR (main.py:274-377).
Spark-first re-expression:

- **Page-parallel scan.** GitHub's `Link` header carries `rel="last"`
  on the first page; the reference only follows `rel="next"`
  (main.py:244-269) and is therefore inherently serial. We probe
  `rel="last"` once on the driver (`partitions()`) and emit **one
  InputPartition per page**, so page fetches + per-PR child fetches run
  across executors. Ingest parallelism = pages × repos, not 1.
- **Pushdown.** `state/per_page/sort/direction` are query params on the
  scan (the reference's own pushdown, main.py:203-208), settable as
  reader options.
- **Throttle/retry.** 403 + `X-RateLimit-Remaining: 0` → sleep until
  `X-RateLimit-Reset` and retry (reference behavior); transient 5xx →
  bounded exponential backoff (the reference exits on any 5xx,
  main.py:421-423 — a hazard, fixed here per §4.1).
- **Child pagination.** commits/reviews/comments follow their own
  `next` links; the reference fetches one page and silently truncates
  at GitHub's default 30 (§4.1 hazard, fixed).
- **Rate budget at scale.** Each partition self-throttles on the
  response headers — primary limits (403 + remaining 0 → sleep to
  reset) AND secondary/abuse limits (403/429 with `Retry-After` →
  bounded honor-and-retry). For fleet-wide fairness,
  `option("requests_per_hour", "5000")` starts a driver-coordinated
  token bucket (sources/ratelimit.py) that every executor task draws
  permits from before each API call — the shared-budget coordination
  SURVEY.md §7.4 flags as risk 4 (`budget_host` = the driver address
  on a real cluster). `option("max_pages", ...)` bounds a BATCH scan
  (e.g. sampling a huge repo); it is deliberately ignored by the
  streaming reader, where a page cap over an ascending listing would
  permanently stall the cursor below the capped pages.

Rows are emitted in the enriched-PR shape (`etl.transform.RAW_PR_SCHEMA`)
so `spark.read.format("github").load()` feeds `etl.transform.transform`
directly.
"""

from __future__ import annotations

import json
import re
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..etl.transform import RAW_PR_SCHEMA

DEFAULT_API_URL = "https://api.github.com"
USER_AGENT = "github-etl-spark/0.1"
MAX_TRANSIENT_RETRIES = 4

# Driver-side token-bucket servers, keyed by (rate, bind) and REUSED
# across reader constructions — one token means one budget, and reuse
# avoids leaking a thread + port per query in a long-lived driver; see
# GithubPullsReader.__init__ and close_budget_servers().
_BUDGET_SERVERS: dict = {}
_BUDGET_LOCK = threading.Lock()


def close_budget_servers() -> None:
    """Shut down every cached driver-side budget server (tests/teardown)."""
    with _BUDGET_LOCK:
        for srv in _BUDGET_SERVERS.values():
            srv.close()
        _BUDGET_SERVERS.clear()


class GithubHttpError(RuntimeError):
    def __init__(self, status: int, url: str, body: str):
        super().__init__(f"GitHub API error {status} for {url}: {body[:200]}")
        self.status = status


def _parse_link_header(value: str | None) -> dict[str, str]:
    """RFC-5988 `Link` header → {rel: url}."""
    rels: dict[str, str] = {}
    if not value:
        return rels
    for part in value.split(","):
        m = re.match(r'\s*<([^>]+)>\s*;\s*rel="([^"]+)"', part)
        if m:
            rels[m.group(2)] = m.group(1)
    return rels


def _page_of(url: str) -> int | None:
    """`page` query param of a Link URL (cf. reference main.py:247-269)."""
    q = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
    vals = q.get("page")
    if not vals:
        return None
    try:
        return int(vals[0])
    except ValueError:
        return None


class GithubClient:
    """Throttled, retrying GET (connector-internal; S5/T2).

    Picklable (plain attrs only) — one instance is shipped to each read
    task inside the reader.
    """

    def __init__(
        self,
        api_url: str,
        token: str | None = None,
        timeout: float = 30.0,
        auth=None,
        budget=None,
    ):
        self.api_url = api_url.rstrip("/")
        self.token = token
        self.timeout = timeout
        # Optional provider with .headers() — e.g. sources.auth
        # .InstallationAuth (GitHub App flow, refreshed per request: the
        # reference's refresh_auth closure, main.py:843-869 / T3).
        self.auth = auth
        # Optional driver-coordinated permit client
        # (sources.ratelimit.BudgetClient) — shares one request budget
        # across every executor task instead of per-task throttling.
        self.budget = budget

    def _headers(self) -> dict[str, str]:
        h = {
            "Accept": "application/vnd.github+json",
            "User-Agent": USER_AGENT,
        }
        if self.auth is not None:
            h.update(self.auth.headers())
        elif self.token:
            h["Authorization"] = f"Bearer {self.token}"
        return h

    def get(self, path: str, params: dict | None = None) -> tuple[object, dict[str, str]]:
        """GET → (parsed JSON, response headers). Sleeps through rate
        limits; retries transient 5xx with exponential backoff."""
        url = path if path.startswith("http") else f"{self.api_url}{path}"
        if params:
            sep = "&" if "?" in url else "?"
            url = url + sep + urllib.parse.urlencode(params)
        transient = 0
        retry_after_honored = 0
        while True:
            if self.budget is not None:
                self.budget.acquire()
            req = urllib.request.Request(url, headers=self._headers())
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    headers = {k.lower(): v for k, v in resp.headers.items()}
                    return json.loads(resp.read().decode("utf-8")), headers
            except urllib.error.HTTPError as e:
                headers = {k.lower(): v for k, v in e.headers.items()}
                if e.code == 403 and headers.get("x-ratelimit-remaining") == "0":
                    self._sleep_for_rate_limit(headers)
                    continue
                # Secondary/abuse limits: 403 or 429 with Retry-After
                # (remaining is NOT 0) — exactly what this connector's
                # parallel fan-out can trigger. Honor the header a
                # bounded number of times, then surface the error.
                if (
                    e.code in (403, 429)
                    and "retry-after" in headers
                    and retry_after_honored < MAX_TRANSIENT_RETRIES
                ):
                    try:
                        wait = float(headers["retry-after"])
                    except ValueError:
                        wait = 1.0
                    time.sleep(min(max(wait, 1.0), 120.0))
                    retry_after_honored += 1
                    continue
                if e.code >= 500 and transient < MAX_TRANSIENT_RETRIES:
                    time.sleep(min(2.0**transient * 0.1, 10.0))
                    transient += 1
                    continue
                body = e.read().decode("utf-8", "replace") if e.fp else ""
                raise GithubHttpError(e.code, url, body) from None

    @staticmethod
    def _sleep_for_rate_limit(headers: dict[str, str]) -> None:
        """Sleep until `X-RateLimit-Reset` (+1 s margin); missing/passed
        reset → minimal sleep (cf. reference main.py:380-389)."""
        try:
            reset = float(headers.get("x-ratelimit-reset", "0"))
        except ValueError:
            reset = 0.0
        time.sleep(max(reset - time.time() + 1.0, 1.0))

    # ---------------------------------------------------------------- scans

    def iter_pages(self, path: str, params: dict | None = None) -> Iterator[list]:
        """Follow `rel="next"` links, yielding one JSON array per page."""
        page, headers = self.get(path, params)
        yield page
        while True:
            nxt = _parse_link_header(headers.get("link")).get("next")
            if nxt is None or not page:
                return
            if (_page_of(nxt) or 0) <= 0:  # invalid page param → stop
                return
            page, headers = self.get(nxt)
            yield page

    def last_page(self, path: str, params: dict) -> int:
        """Total pages for a paginated listing, from `rel="last"` of the
        first response. 1 when there is a single page."""
        _, headers = self.get(path, params)
        last = _parse_link_header(headers.get("link")).get("last")
        return max(_page_of(last) or 1, 1) if last else 1


class PrPagePartition(InputPartition):
    def __init__(self, repo: str, page: int):
        self.repo = repo
        self.page = page


class GithubPullsReader(DataSourceReader):
    """Reads enriched PRs: one partition per (repo, page)."""

    def __init__(self, options: dict):
        repos = options.get("repos") or options.get("repo") or ""
        self.repos = [r.strip() for r in repos.split(",") if r.strip()]
        if not self.repos:
            raise ValueError("github source requires option 'repo' (or 'repos')")
        api_url = options.get("url", DEFAULT_API_URL)
        token = options.get("token") or None
        budget = None
        rph = float(options.get("requests_per_hour", "0") or 0)
        if rph > 0:
            # Bucket server lives on the driver (where the reader is
            # constructed); executors reach it via budget_host — the
            # driver's address (spark.driver.host on a real cluster,
            # loopback in local mode) — and budget_bind controls which
            # interface it listens on (loopback by default; set to the
            # driver's interface on a real cluster). Kept in a module
            # registry, NOT on self: the reader is pickled to executors
            # and a live HTTP server isn't (the picklable BudgetClient
            # is all they need). The registry is keyed by (rate, bind)
            # so repeated reader constructions share one server — one
            # token, one budget, no thread/port leak per query.
            from .ratelimit import TokenBucketServer

            bind = options.get("budget_bind", "127.0.0.1")
            with _BUDGET_LOCK:
                server = _BUDGET_SERVERS.get((rph, bind))
                if server is None:
                    server = TokenBucketServer(rph, bind=bind)
                    _BUDGET_SERVERS[(rph, bind)] = server
            budget = server.client(options.get("budget_host", "127.0.0.1"))
        # GitHub App installations are per-org/per-repo-selection: a
        # token minted for repo A's installation cannot read repo B
        # under another installation, so each repo gets its own client
        # (same static-token client is shared when no app auth).
        self._clients: dict[str, GithubClient] = {}
        for repo in self.repos:
            auth = None
            if options.get("app_id") and options.get("private_key"):
                from .auth import InstallationAuth

                auth = InstallationAuth(
                    app_id=options["app_id"],
                    private_key_pem=options["private_key"].replace("\\n", "\n"),
                    repo=repo,
                    api_url=api_url.rstrip("/"),
                )
            self._clients[repo] = GithubClient(
                api_url, token, auth=auth, budget=budget
            )
        self.client = self._clients[self.repos[0]]
        self.per_page = int(options.get("per_page", "100"))
        self.state = options.get("state", "all")
        self.max_pages = int(options.get("max_pages", "0"))  # 0 = unbounded
        self.with_children = options.get("with_children", "true").lower() == "true"
        # A PR can vanish between the listing and its child fetches
        # (deleted repo content, force-push). One missing PR must not
        # fail a whole scan task; 404s on child endpoints degrade to
        # empty children unless skip_missing=false.
        self.skip_missing = options.get("skip_missing", "true").lower() == "true"

    def client_for(self, repo: str) -> GithubClient:
        return self._clients.get(repo, self.client)

    def _list_params(self) -> dict:
        # The reference's source pushdown (main.py:203-208).
        return {
            "state": self.state,
            "per_page": self.per_page,
            "sort": "created",
            "direction": "asc",
        }

    def partitions(self) -> list[PrPagePartition]:
        parts: list[PrPagePartition] = []
        for repo in self.repos:
            n = self.client_for(repo).last_page(
                f"/repos/{repo}/pulls", self._list_params()
            )
            if self.max_pages:
                n = min(n, self.max_pages)
            parts.extend(PrPagePartition(repo, p) for p in range(1, n + 1))
        return parts

    def read(self, partition: PrPagePartition) -> Iterator[tuple]:
        c = self.client_for(partition.repo)
        params = {**self._list_params(), "page": partition.page}
        prs, _ = c.get(f"/repos/{partition.repo}/pulls", params)
        for pr in prs:
            number = pr.get("number")
            if number is None:
                continue  # F3: un-enrichable row (reference hazard main.py:228-230)
            commits, reviews, comments = self.children(partition.repo, number)
            yield self._to_row(pr, commits, reviews, comments)

    def children(self, repo: str, number: int) -> tuple[list, list, list]:
        """Fetch (commits, reviews, comments) for one PR, with the F1/F2
        row filters applied (reference main.py:335,369). 404s degrade to
        empty children when skip_missing (vanished PR ≠ failed scan)."""
        if not self.with_children:
            return [], [], []
        c = self.client_for(repo)
        try:
            commits = self._commits(repo, number)
            reviews = [
                r
                for page in c.iter_pages(
                    f"/repos/{repo}/pulls/{number}/reviews",
                    {"per_page": self.per_page},
                )
                for r in page
                if r.get("user") is not None  # F1 (reference main.py:335)
            ]
            comments = [
                cm
                for page in c.iter_pages(
                    f"/repos/{repo}/issues/{number}/comments",
                    {"per_page": self.per_page},
                )
                for cm in page
                if cm.get("user") is not None and cm.get("body")  # F2
            ]
        except GithubHttpError as e:
            if e.status == 404 and self.skip_missing:
                return [], [], []
            raise
        return commits, reviews, comments

    def _commits(self, repo: str, number: int) -> list[dict]:
        """Commit list + per-commit file detail (S2's N+1 join, J1).

        The list endpoint omits `files`; the detail endpoint carries it.
        A 404 on ONE sha's detail (garbage-collected after a force-push
        while the PR stays alive) keeps the commit with empty `files`
        rather than discarding the whole PR's children.
        """
        c = self.client_for(repo)
        out = []
        for page in c.iter_pages(
            f"/repos/{repo}/pulls/{number}/commits", {"per_page": self.per_page}
        ):
            for commit in page:
                sha = commit.get("sha")
                if sha:
                    try:
                        detail, _ = c.get(f"/repos/{repo}/commits/{sha}")
                        commit = {**commit, "files": detail.get("files", [])}
                    except GithubHttpError as e:
                        if e.status != 404 or not self.skip_missing:
                            raise
                        commit = {**commit, "files": []}
                out.append(commit)
        return out

    @staticmethod
    def _to_row(pr: dict, commits: list, reviews: list, comments: list) -> tuple:
        """Project the raw JSON onto RAW_PR_SCHEMA field order."""

        def _files(commit: dict) -> list[tuple]:
            return [
                (f.get("filename"), f.get("additions"), f.get("deletions"))
                for f in commit.get("files") or []
            ]

        def _author(commit: dict) -> tuple | None:
            a = (commit.get("commit") or {}).get("author")
            if a is None:
                return None
            return ((a.get("name"), a.get("date")),)

        return (
            pr.get("number"),
            pr.get("title"),
            pr.get("state"),
            pr.get("created_at"),
            pr.get("updated_at"),
            pr.get("merged_at"),
            [(lbl.get("name"),) for lbl in pr.get("labels") or []],
            [
                (
                    cm.get("sha"),
                    _author(cm),
                    _files(cm),
                )
                for cm in commits
            ],
            [
                (
                    r.get("id"),
                    ((r.get("user") or {}).get("login"),),
                    r.get("state"),
                    r.get("submitted_at"),
                )
                for r in reviews
            ],
            [
                (
                    cm.get("id"),
                    ((cm.get("user") or {}).get("login"),),
                    cm.get("body"),
                    cm.get("created_at"),
                    cm.get("pull_request_review_id"),
                )
                for cm in comments
            ],
        )


class GithubStreamReader(SimpleDataSourceStreamReader):
    """Incremental PR ingest: `spark.readStream.format("github")`.

    Offset = highest PR number ingested (PR numbers are monotone per
    repo, and the scan is pinned to `sort=created, direction=asc`, the
    reference's own ordering contract — main.py:203-208). Each
    micro-batch reads only PRs with number > offset, enriches them, and
    advances the cursor; `readBetweenOffsets` replays a committed range
    deterministically for recovery, giving exactly-once delivery into a
    checkpointed sink. This is the T1 chunked pipeline as a *live*
    stream rather than a daily batch — the reference must re-run and
    re-fetch the whole day to catch up; this resumes from the cursor.

    Steady-state cost: the listing is walked NEWEST-first
    (`direction=desc`) and stops at the first PR at or below the
    cursor, so a trigger with no new PRs costs ONE request — not a full
    re-listing. Backfill (first batch from offset 0) is bounded by
    `stream_max_prs` per micro-batch (oldest-first), so a huge repo
    ingests as a sequence of bounded batches instead of one enormous
    driver-side read. `max_pages` is deliberately ignored here — a page
    cap over the listing would permanently stall the cursor.

    Single-repo by design (offsets are per-repo); run one stream per
    repo and union downstream if needed.
    """

    def __init__(self, options: dict):
        repo = options.get("repo") or options.get("repos") or ""
        self.repo = repo.split(",")[0].strip()
        if not self.repo:
            raise ValueError("github stream requires option 'repo'")
        self.batch = GithubPullsReader({**options, "repo": self.repo, "max_pages": "0"})
        self.max_prs = int(options.get("stream_max_prs", "1000"))

    def initialOffset(self) -> dict:
        return {"last_number": 0}

    def _list_newer_than(self, last: int, upto: int | None = None):
        """All listing rows with last < number (<= upto), walking pages
        newest-first and early-stopping at the cursor."""
        c = self.batch.client
        params = {**self.batch._list_params(), "direction": "desc"}
        rows = []
        page = 1
        while True:
            prs, headers = c.get(
                f"/repos/{self.repo}/pulls", {**params, "page": page}
            )
            if not prs:
                break
            hit_cursor = False
            for pr in prs:
                n = pr.get("number")
                if n is None:
                    continue
                if n <= last:
                    hit_cursor = True
                    continue
                if upto is not None and n > upto:
                    continue
                rows.append(pr)
            if hit_cursor:
                break
            if _parse_link_header(headers.get("link")).get("next") is None:
                break
            page += 1
        rows.sort(key=lambda p: p["number"])  # oldest-first for the cap
        return rows

    def read(self, start: dict):
        last = int(start.get("last_number", 0))
        prs = self._list_newer_than(last)[: self.max_prs]
        max_seen = prs[-1]["number"] if prs else last
        # iter() over a materialized list: the prefetcher calls next()
        # (so it needs a real iterator) and caches the consumed rows
        # driver-side (so every row must be picklable — plain tuples).
        return iter(list(self._enrich(prs))), {"last_number": max_seen}

    def readBetweenOffsets(self, start: dict, end: dict):
        prs = self._list_newer_than(
            int(start.get("last_number", 0)), int(end.get("last_number", 0))
        )
        return iter(list(self._enrich(prs)))

    def _enrich(self, prs):
        for pr in prs:
            commits, reviews, comments = self.batch.children(self.repo, pr["number"])
            yield GithubPullsReader._to_row(pr, commits, reviews, comments)


class GithubDataSource(DataSource):
    """`spark.read.format("github")` after `register(spark)`.

    Options: `repo`/`repos` (comma list), `url` (API base override —
    the reference's GITHUB_API_URL, main.py:799-801), `token`,
    `per_page`, `state`, `max_pages`, `with_children`.
    """

    @classmethod
    def name(cls) -> str:
        return "github"

    def schema(self):
        return RAW_PR_SCHEMA

    def reader(self, schema) -> GithubPullsReader:
        return GithubPullsReader(self.options)

    def simpleStreamReader(self, schema) -> GithubStreamReader:
        return GithubStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(GithubDataSource)
