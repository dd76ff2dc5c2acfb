#!/usr/bin/env python3
"""Generate a markdown API index (module -> public classes/functions).

Lightweight equivalent of the reference's mkdocs nav generator
(``scripts/generate_api_docs.py``): walks ``kaptive_tpu``'s modules and writes
``docs/api.md`` listing each module's public surface with its first docstring
line.
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path(__file__).resolve().parents[1] / "docs" / "api.md"


def first_line(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    return doc.splitlines()[0] if doc else ""


def main() -> None:
    import kaptive_tpu

    lines = ["# kaptive-tpu API index\n"]
    for info in sorted(
        pkgutil.walk_packages(kaptive_tpu.__path__, prefix="kaptive_tpu."),
        key=lambda m: m.name,
    ):
        if any(part.startswith("_") for part in info.name.split(".")[1:]):
            continue
        try:
            mod = importlib.import_module(info.name)
        except Exception as exc:  # optional deps etc.
            lines.append(f"## `{info.name}`\n\n*(not importable: {exc})*\n")
            continue
        lines.append(f"## `{info.name}`\n")
        if first_line(mod):
            lines.append(first_line(mod) + "\n")
        members = []
        for name, obj in vars(mod).items():
            if name.startswith("_") or getattr(obj, "__module__", None) != info.name:
                continue
            if inspect.isclass(obj) or inspect.isfunction(obj):
                members.append(f"- **`{name}`** — {first_line(obj)}")
        if members:
            lines.append("\n".join(sorted(members)) + "\n")
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
