#!/usr/bin/env python3
"""Build docs/releases.md from the project's GitHub releases feed.

Doc/CI helper (capability parity with the reference's release-notes
generator, ``/root/reference/scripts/generate_release_notes.py``): fetches
the latest releases through the GitHub REST API and renders one markdown
section per release, newest first.  Network failures exit non-zero so CI
surfaces them.

Usage:  python scripts/generate_release_notes.py [--repo OWNER/NAME]
                                                 [--out docs/releases.md]
                                                 [--limit 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.error
import urllib.request

FRONTMATTER = """---
title: Release Notes
comments: true
tags: [markdown, documentation, web]
icon: lucide/rocket
categories:
  - Development
---

"""


def fetch_releases(repo: str, limit: int) -> list[dict]:
    request = urllib.request.Request(
        f"https://api.github.com/repos/{repo}/releases",
        headers={
            "Accept": "application/vnd.github+json",
            "User-Agent": "kaptive-tpu-release-notes",
        },
    )
    with urllib.request.urlopen(request) as response:
        return json.loads(response.read().decode("utf-8"))[:limit]


def render(releases: list[dict]) -> str:
    sections = [FRONTMATTER]
    for release in releases:
        name = release.get("name") or release.get("tag_name", "unnamed")
        date = (release.get("published_at") or "")[:10]
        sections.append(
            f"# {name}\n*Published on {date}*\n\n{release.get('body', '')}\n\n---\n\n"
        )
    return "".join(sections)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--repo", default="klebgenomics/kaptive-tpu")
    parser.add_argument("--out", default="docs/releases.md")
    parser.add_argument("--limit", type=int, default=5)
    args = parser.parse_args()
    try:
        releases = fetch_releases(args.repo, args.limit)
    except (urllib.error.URLError, OSError, ValueError) as exc:
        print(f"release fetch failed: {exc}", file=sys.stderr)
        return 1
    with open(args.out, "w", encoding="utf-8") as handle:
        handle.write(render(releases))
    print(f"wrote {args.out} ({len(releases)} releases)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
