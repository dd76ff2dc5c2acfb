"""Offline-testable logic of the doc/CI scripts (network calls stay untested)."""

import importlib.util
import sys
from pathlib import Path

SCRIPTS = Path(__file__).parent.parent / "scripts"


def _load(name: str):
    spec = importlib.util.spec_from_file_location(name, SCRIPTS / f"{name}.py")
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


def test_release_notes_render():
    mod = _load("generate_release_notes")
    releases = [
        {"name": "v2.0.0", "published_at": "2026-08-01T10:00:00Z", "body": "Big rewrite."},
        {"tag_name": "v1.9.1", "published_at": "2026-07-15T10:00:00Z", "body": "Fixes."},
    ]
    out = mod.render(releases)
    assert out.startswith("---\ntitle: Release Notes")
    assert "# v2.0.0\n*Published on 2026-08-01*" in out
    assert "# v1.9.1" in out and "Fixes." in out


def test_translate_markdown_preserves_frontmatter_structure():
    mod = _load("translate_docs")
    doc = "---\ntitle: Quick start\nicon: rocket\n---\nInstall the package.\n"
    out = mod.translate_markdown(doc, lambda text, lang: f"[{lang}]{text}", "FR")
    assert out.startswith("---\ntitle: [FR]Quick start\nicon: rocket\n---\n")
    assert out.endswith("[FR]Install the package.\n")


def test_translate_tree_skips_reference_pages(tmp_path):
    mod = _load("translate_docs")
    docs = tmp_path / "docs"
    (docs / "reference").mkdir(parents=True)
    (docs / "index.md").write_text("hello\n")
    (docs / "reference" / "api.md").write_text("api\n")
    mod.translate_tree(docs, lambda text, lang: f"[{lang}]{text}", {"ES": "es"})
    out = tmp_path / "docs_es"
    assert (out / "index.md").read_text() == "[ES]hello\n"
    assert (out / "reference" / "api.md").read_text() == "api\n"  # untouched


def test_fetch_announcement_noop_without_token(monkeypatch, tmp_path):
    mod = _load("fetch_announcement")
    monkeypatch.delenv("GITHUB_TOKEN", raising=False)
    monkeypatch.setattr(sys, "argv", ["fetch_announcement", "--out", str(tmp_path / "a.html")])
    assert mod.main() == 0
    assert not (tmp_path / "a.html").exists()


def test_api_docs_generator_emits_tree(tmp_path, monkeypatch):
    mod = _load("generate_api_docs")
    monkeypatch.setattr(mod, "OUT", tmp_path / "api.md")
    mod.main()
    text = (tmp_path / "api.md").read_text()
    # every package of the inventory appears with members documented
    for anchor in (
        "`kaptive_tpu.serotyping.core`", "`kaptive_tpu.ops.mapper`",
        "`kaptive_tpu.db.manager`", "`kaptive_tpu.parallel.typing`",
        "**`Serotyper`**", "**`DatabaseManager`**",
    ):
        assert anchor in text, anchor


def test_cli_docs_generator_emits_pages(tmp_path, monkeypatch):
    mod = _load("generate_cli_docs")
    monkeypatch.setattr(mod, "DOCS", tmp_path)
    mod.main()
    pages = {p.name for p in tmp_path.glob("*.md")}
    assert pages == {"type.md", "convert.md", "database.md"}
    dbpage = (tmp_path / "database.md").read_text()
    # the full subcommand tree renders, one section per command
    for sub in ("db list", "db install", "db update", "db add", "db extract loci",
                "db extract genes", "db extract proteins", "db metadata", "db reset"):
        assert f"kaptive-tpu database {sub.split(' ', 1)[1]}" in dbpage or sub in dbpage, sub
