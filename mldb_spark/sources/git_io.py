"""import.git (plugins/git/git.cc:490): one row per commit with
author/committer/message/parents and per-commit change stats.

The reference walks the repo with libgit2 single-node; here the walk
is one `git log` subprocess whose parsed records land in a DataFrame
(commit history is metadata-sized next to any data corpus — the
distributed part is whatever joins/aggregations run downstream).
"""

from __future__ import annotations

import subprocess

from pyspark.sql import DataFrame, SparkSession

_FORMAT = "%H%x1f%an%x1f%ae%x1f%cn%x1f%ce%x1f%at%x1f%P%x1f%s"


def import_git(
    spark: SparkSession,
    repository: str,
    revision: str = "HEAD",
    limit: int | None = None,
    import_stats: bool = True,
) -> DataFrame:
    """Commit-history dataset: (commit, author_name, author_email,
    committer_name, committer_email, author_ts, parents, message,
    files_changed, insertions, deletions). import_stats=False skips
    the per-commit numstat pass (faster on huge histories)."""
    args = ["git", "-C", repository, "log", revision, f"--format={_FORMAT}"]
    if import_stats:
        args.append("--numstat")
    if limit is not None:
        args.append(f"-n{limit}")
    raw = subprocess.run(args, capture_output=True, text=True, check=True).stdout

    rows = []
    cur = None
    for line in raw.splitlines():
        if "\x1f" in line:
            if cur is not None:
                rows.append(cur)
            sha, an, ae, cn, ce, at, parents, subject = line.split("\x1f")
            cur = {
                "commit": sha,
                "author_name": an,
                "author_email": ae,
                "committer_name": cn,
                "committer_email": ce,
                "author_ts": int(at),
                "parents": parents.split() if parents else [],
                "message": subject,
                "files_changed": 0,
                "insertions": 0,
                "deletions": 0,
            }
        elif line.strip() and cur is not None:
            parts = line.split("\t")
            if len(parts) == 3:
                ins, dels, _path = parts
                cur["files_changed"] += 1
                # binary files report '-' for both counts
                cur["insertions"] += int(ins) if ins.isdigit() else 0
                cur["deletions"] += int(dels) if dels.isdigit() else 0
    if cur is not None:
        rows.append(cur)

    schema = (
        "commit string, author_name string, author_email string, "
        "committer_name string, committer_email string, author_ts long, "
        "parents array<string>, message string, files_changed long, "
        "insertions long, deletions long"
    )
    return spark.createDataFrame(
        [tuple(r[k] for k in (
            "commit", "author_name", "author_email", "committer_name",
            "committer_email", "author_ts", "parents", "message",
            "files_changed", "insertions", "deletions",
        )) for r in rows],
        schema,
    )


def import_xlsx(spark: SparkSession, path: str, sheet: str | None = None) -> DataFrame:
    """experimental.import.xlsx (plugins/msoffice/xlsx_importer.cc:821)
    — GATED: needs openpyxl, which is not in this container. When the
    library is present, each sheet row becomes a dataset row with
    header-derived column names (the reference's cell-grid contract)."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "import.xlsx needs openpyxl (not installed). With it: "
            "load_workbook(path, read_only=True), take the header row "
            "as column names, spark.createDataFrame(rows, names)."
        ) from e
    from openpyxl import load_workbook

    wb = load_workbook(path, read_only=True)
    ws = wb[sheet] if sheet else wb.active
    it = ws.iter_rows(values_only=True)
    header = [str(h) for h in next(it)]
    return spark.createDataFrame([tuple(r) for r in it], header)
