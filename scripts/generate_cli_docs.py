#!/usr/bin/env python3
"""Generate markdown CLI reference pages from the live argparse tree.

Walks every command and subcommand of the ``kaptive-tpu`` CLI and writes one
markdown page per top-level command under ``docs/cli/`` (capability parity
with the reference's ``scripts/generate_cli_docs.py``).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

os.environ["NO_COLOR"] = "1"
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DOCS = Path(__file__).resolve().parents[1] / "docs" / "cli"


def _walk(cmd, trail: list[str], out: list[str]) -> None:
    title = " ".join(trail)
    out.append(f"## `{title}`\n")
    if cmd.description:
        out.append(cmd.description.strip() + "\n")
    out.append("```text\n" + cmd.parser.format_help().rstrip() + "\n```\n")
    for child in cmd.subcommands:
        _walk(child, trail + [child.name], out)


def main() -> None:
    from kaptive_tpu.cli import Cli
    from kaptive_tpu.db.cli import Database
    from kaptive_tpu.serotyping.cli import Convert, Type

    sys.argv[0] = "kaptive-tpu"
    DOCS.mkdir(parents=True, exist_ok=True)
    for cmd_cls in (Type, Convert, Database):
        cli = Cli()
        cmd = cmd_cls()
        cli.mount(cmd)
        pages: list[str] = [f"# kaptive-tpu {cmd.name}\n"]
        _walk(cmd, ["kaptive-tpu", cmd.name], pages)
        page = DOCS / f"{cmd.name}.md"
        page.write_text("\n".join(pages))
        print(f"wrote {page}")


if __name__ == "__main__":
    main()
