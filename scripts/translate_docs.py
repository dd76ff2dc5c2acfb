#!/usr/bin/env python3
"""Machine-translate the docs tree into per-language copies via DeepL.

Doc/CI helper (capability parity with the reference's translator,
``/root/reference/scripts/translate_docs.py``): copies ``docs/`` to
``docs_<lang>/`` for each target language and translates every markdown file
(frontmatter ``title:``/``description:`` values plus the body), skipping
generated API-reference pages.  Requires the optional ``deepl`` package and a
``$DEEPL_API_KEY``; both absences exit with a clear message (the package is
not part of this repo's baked dependencies).

Usage:  DEEPL_API_KEY=... python scripts/translate_docs.py [--docs docs]
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import sys
from pathlib import Path

LANGUAGES = {"ES": "es", "FR": "fr", "ZH": "zh", "JA": "ja"}

_FRONTMATTER = re.compile(r"^(---\n.*?\n---\n)(.*)", re.DOTALL)


def translate_markdown(content: str, translate, target_lang: str) -> str:
    r"""Translate a markdown document, preserving frontmatter structure.

    ``translate(text, lang) -> str`` is injected so the logic is testable
    without the DeepL SDK or network.
    """
    frontmatter, body = "", content
    if match := _FRONTMATTER.match(content):
        frontmatter, body = match.group(1), match.group(2)
        for key in ("title", "description"):
            if key_match := re.search(rf"^({key}:\s*)(.*)$", frontmatter, re.MULTILINE):
                value = key_match.group(2).strip("'\"")
                frontmatter = frontmatter.replace(
                    key_match.group(0), key_match.group(1) + translate(value, target_lang)
                )
    if not body.strip():
        return frontmatter + body
    return frontmatter + translate(body, target_lang)


def translate_tree(docs_dir: Path, translate, languages: dict[str, str]) -> None:
    for lang_code, lang_dir in languages.items():
        target_dir = docs_dir.parent / f"{docs_dir.name}_{lang_dir}"
        if target_dir.exists():
            shutil.rmtree(target_dir)
        shutil.copytree(docs_dir, target_dir)
        for md_file in target_dir.rglob("*.md"):
            if "reference" in md_file.parts:  # mkdocstrings-generated pages
                continue
            md_file.write_text(
                translate_markdown(md_file.read_text(encoding="utf-8"), translate, lang_code),
                encoding="utf-8",
            )
        print(f"translated {docs_dir} -> {target_dir}")


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--docs", default="docs")
    args = parser.parse_args()
    api_key = os.environ.get("DEEPL_API_KEY")
    if not api_key:
        print("DEEPL_API_KEY is not set", file=sys.stderr)
        return 1
    try:
        import deepl
    except ImportError:
        print("the optional 'deepl' package is not installed", file=sys.stderr)
        return 1
    translator = deepl.Translator(api_key)

    def translate(text: str, lang: str) -> str:
        return translator.translate_text(text, target_lang=lang).text

    translate_tree(Path(args.docs), translate, LANGUAGES)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
