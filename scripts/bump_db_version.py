#!/usr/bin/env python3
"""Bump the semver ``version`` field of a database TOML in place.

Used by database-repository CI to cut releases (capability parity with the
reference's ``scripts/bump_db_version.py``, which the DB repos fetch remotely
in their ``database_cicd.yml``).  Stdlib-only: the version line is rewritten
textually so every other byte of the TOML (comments, ordering, formatting)
is preserved.

Usage:  python scripts/bump_db_version.py <db.toml> {major|minor|patch}
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

_VERSION_LINE = re.compile(
    r'^(?P<prefix>\s*version\s*=\s*")(?P<ver>\d+\.\d+\.\d+)(?P<suffix>"\s*)$',
    re.MULTILINE,
)


def bumped(version: str, kind: str) -> str:
    major, minor, patch = (int(x) for x in version.split("."))
    if kind == "major":
        return f"{major + 1}.0.0"
    if kind == "minor":
        return f"{major}.{minor + 1}.0"
    if kind == "patch":
        return f"{major}.{minor}.{patch + 1}"
    raise ValueError(f"unknown bump kind {kind!r}")


def bump_file(path: Path, kind: str) -> tuple[str, str]:
    text = path.read_text()
    match = _VERSION_LINE.search(text)
    if match is None:
        raise ValueError(f"no semver 'version = \"X.Y.Z\"' line found in {path}")
    old = match.group("ver")
    new = bumped(old, kind)
    path.write_text(
        text[: match.start()]
        + match.group("prefix")
        + new
        + match.group("suffix")
        + text[match.end() :]
    )
    return old, new


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("toml", type=Path, help="database metadata TOML file")
    ap.add_argument("bump", choices=("major", "minor", "patch"))
    args = ap.parse_args()
    old, new = bump_file(args.toml, args.bump)
    print(f"{args.toml}: {old} -> {new}")


if __name__ == "__main__":
    sys.exit(main())
