#!/usr/bin/env python3
"""Refresh the docs banner with the newest Announcements discussion.

Doc/CI helper (capability parity with the reference's announcement fetcher,
``/root/reference/scripts/fetch_announcement.py``): queries the GitHub
GraphQL discussions API (token from ``$GITHUB_TOKEN`` — provided by Actions)
for the latest discussion in the Announcements category and writes the banner
HTML fragment the docs theme includes.  Without a token it is a quiet no-op
(local builds shouldn't need network credentials).

Usage:  GITHUB_TOKEN=... python scripts/fetch_announcement.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

QUERY_TEMPLATE = """
query {{
  repository(owner: "{owner}", name: "{name}") {{
    discussions(first: 20, orderBy: {{field: CREATED_AT, direction: DESC}}) {{
      nodes {{ title url category {{ name }} }}
    }}
  }}
}}
"""


def latest_announcement(owner: str, name: str, category: str, token: str) -> dict | None:
    request = urllib.request.Request(
        "https://api.github.com/graphql",
        method="POST",
        headers={
            "Authorization": f"Bearer {token}",
            "Content-Type": "application/json",
        },
        data=json.dumps({"query": QUERY_TEMPLATE.format(owner=owner, name=name)}).encode(),
    )
    with urllib.request.urlopen(request) as response:
        payload = json.loads(response.read())
    nodes = payload["data"]["repository"]["discussions"]["nodes"]
    return next((d for d in nodes if d["category"]["name"] == category), None)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--repo", default="klebgenomics/kaptive-tpu")
    parser.add_argument("--category", default="Announcements")
    parser.add_argument("--out", default="overrides/announcement.html")
    args = parser.parse_args()
    token = os.environ.get("GITHUB_TOKEN")
    if not token:
        print("no GITHUB_TOKEN: skipping announcement refresh", file=sys.stderr)
        return 0
    owner, name = args.repo.split("/", 1)
    try:
        announcement = latest_announcement(owner, name, args.category, token)
    except Exception as exc:  # CI banner refresh must never break the build
        print(f"announcement fetch failed: {exc}", file=sys.stderr)
        return 0
    if announcement is None:
        return 0
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    import html

    with open(args.out, "w", encoding="utf-8") as handle:
        handle.write(
            "<strong>\N{PUBLIC ADDRESS LOUDSPEAKER} Latest Update:</strong> "
            f'<a href="{html.escape(announcement["url"], quote=True)}">'
            f'{html.escape(announcement["title"])}</a>'
        )
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
