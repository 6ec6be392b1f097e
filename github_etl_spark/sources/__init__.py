"""Sources: custom Spark data sources (GitHub REST connector)."""

from .github import GithubClient, GithubDataSource, register  # noqa: F401
