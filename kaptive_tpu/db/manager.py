r"""Decentralised database lifecycle: fetch, version-gate, compile, cache.

Capability parity with ``/root/reference/src/kaptive/db/manager.py:32-558``:
the known-DB registry (:63-71), ``$KAPTIVE_DB_DIR``/``~/.kaptive`` cache with
pickle + JSON metadata sidecar (:72-73, :538-558), ``reset``/``uninstall``
(:113-152), ``installed``/``known`` (:155-186), threaded ``update``/``install``
(:189-304), GitHub raw fetch with semver gating (:306-395), ``add`` (:434-481),
``load`` (:484-503) and the path-or-keyword auto-installing ``get`` (:506-536).
``get`` additionally accepts direct ``.gbk``/``.pkl`` paths, which is the
offline-friendly path (no network required).
"""

from __future__ import annotations

import concurrent.futures
import json
import os
import pickle
import tomllib
import urllib.error
from collections.abc import Generator
from dataclasses import asdict
from pathlib import Path
from tempfile import TemporaryDirectory
from urllib.request import urlopen

from kaptive_tpu.db.core import Database
from kaptive_tpu.db.models import DatabaseError, DatabaseMetadata


class DatabaseManager:
    r"""Download, compile, and cache locus databases from curator GitHub repositories."""

    _KNOWN = {
        "kpsc_k": ("klebgenomics", "KpSC_surface_antigen_loci", "Klebsiella_pneumoniae_Species_Complex_K"),
        "kpsc_o": ("klebgenomics", "KpSC_surface_antigen_loci", "Klebsiella_pneumoniae_Species_Complex_O"),
        "kosc_k": ("klebgenomics", "KoSC-surface-antigen-loci", "Klebsiella_oxytoca_Species_Complex_K_locus_database"),
        "kosc_o": ("klebgenomics", "KoSC-surface-antigen-loci", "Klebsiella_oxytoca_Species_Complex_O_locus_database"),
        "ab_k": ("johannajkenyon", "Abaumannii_surface_polysaccharide_loci", "Acinetobacter_baumannii_K"),
        "ab_o": ("johannajkenyon", "Abaumannii_surface_polysaccharide_loci", "Acinetobacter_baumannii_OC"),
        "ecoli_kps": ("rgladstone", "EC-K-typing", "EC-K-typing_group2and3"),
    }

    @classmethod
    def _db_dir(cls) -> Path:
        d = Path(os.environ.get("KAPTIVE_DB_DIR", Path.home() / ".kaptive"))
        d.mkdir(parents=True, exist_ok=True)
        return d

    @classmethod
    def _get_db_path(cls, kwd: str) -> Path:
        return cls._db_dir() / f"{kwd}.pkl"

    @classmethod
    def _get_existing_db_path(cls, kwd: str) -> Path:
        db_path = cls._get_db_path(kwd)
        if not db_path.is_file():
            raise DatabaseError(f'Database "{kwd}" has not been installed.')
        return db_path

    @classmethod
    def reset(cls) -> None:
        d = cls._db_dir()
        if d.exists():
            for file_path in d.glob("*.pkl"):
                file_path.unlink()
            for file_path in d.glob("*.json"):
                file_path.unlink()

    @classmethod
    def uninstall(cls, kwd: str) -> None:
        db_path = cls._get_existing_db_path(kwd)
        db_path.unlink()
        if db_path.with_suffix(".json").exists():
            db_path.with_suffix(".json").unlink()

    @classmethod
    def installed(cls) -> list[str]:
        d = cls._db_dir()
        if not d.exists():
            return []
        return [p.stem for p in d.glob("*.pkl")]

    @classmethod
    def known(cls) -> list[str]:
        return list(cls._KNOWN.keys())

    @classmethod
    def _local_meta(cls, kwd: str) -> DatabaseMetadata:
        db_path = cls._get_existing_db_path(kwd)
        json_path = db_path.with_suffix(".json")
        if json_path.is_file():
            return DatabaseMetadata.from_dict(json.loads(json_path.read_text()))
        return pickle.loads(db_path.read_bytes()).metadata

    @classmethod
    def update(cls, kwd: str | list[str] = "all") -> Generator[Database, None, None]:
        r"""Recompile any installed databases whose remote version is newer."""
        if kwd == "all":
            kwd = cls.installed()
            if not kwd:
                return

        if isinstance(kwd, list):
            def _fetch_update_one(k: str):
                meta = cls._local_meta(k)
                db_name = Path(meta.genbank).with_suffix("").name
                return cls._fetch_files(meta.owner, meta.repo, db_name, branch=meta.branch, local_meta=meta)

            with concurrent.futures.ThreadPoolExecutor() as executor:
                fetched_list = list(executor.map(_fetch_update_one, kwd))
            for fetched in fetched_list:
                if fetched is not None:
                    yield cls._compile_and_save(*fetched)
        else:
            meta = cls._local_meta(kwd)
            db_name = Path(meta.genbank).with_suffix("").name
            if (res := cls.add(meta.owner, meta.repo, db_name, branch=meta.branch, local_meta=meta)) is not None:
                yield res

    @classmethod
    def install(cls, kwd: str | list[str]) -> Database | list[Database | None] | None:
        r"""Install known databases by keyword (threaded for lists / 'all')."""
        if kwd == "all":
            kwd = list(cls._KNOWN.keys())

        if isinstance(kwd, list):
            def _fetch_one(k: str):
                if (known_info := cls._KNOWN.get(k, None)) is None:
                    raise DatabaseError(
                        f'"{k}" is not a known database, choose from {list(cls._KNOWN.keys())}'
                    )
                return cls._fetch_files(*known_info)

            with concurrent.futures.ThreadPoolExecutor() as executor:
                fetched_list = list(executor.map(_fetch_one, kwd))
            return [None if f is None else cls._compile_and_save(*f) for f in fetched_list]

        if (known_info := cls._KNOWN.get(kwd, None)) is None:
            raise DatabaseError(f'"{kwd}" is not a known database, choose from {list(cls._KNOWN.keys())}')
        return cls.add(*known_info)

    @classmethod
    def _fetch_files(
        cls,
        owner: str,
        repo_name: str,
        db_name: str,
        branch: str = "main",
        local_meta: DatabaseMetadata | None = None,
    ) -> tuple[str, bytes, bytes] | None:
        # $KAPTIVE_DB_RAW_BASE points the fetcher at a mirror (or, in tests,
        # a localhost HTTP server) instead of GitHub raw.
        raw_base = os.environ.get("KAPTIVE_DB_RAW_BASE", "https://raw.githubusercontent.com")
        base_url = f"{raw_base}/{owner}/{repo_name}/{branch}"
        toml_url = f"{base_url}/{db_name}.toml"
        gbk_url = f"{base_url}/{db_name}.gbk"

        def _fetch(url: str) -> bytes:
            try:
                with urlopen(url) as response:
                    return response.read()
            except urllib.error.HTTPError as e:
                if e.code == 404:
                    raise DatabaseError(
                        f"Remote file not found: {url}\n"
                        "Ensure the repository branch, name, and owner are correct."
                    ) from e
                raise DatabaseError(f"HTTP Error {e.code} fetching {url}: {e.reason}") from e
            except urllib.error.URLError as e:
                raise DatabaseError(
                    f"Network error: Failed to fetch {url}. "
                    f"Ensure you have an active internet connection. ({e.reason})"
                ) from e

        toml_bytes = _fetch(toml_url)
        remote_meta = DatabaseMetadata.from_dict(tomllib.loads(toml_bytes.decode("utf-8")))

        db_path = cls._get_db_path(remote_meta.keyword)
        json_path = db_path.with_suffix(".json")
        if local_meta is None and db_path.is_file():
            if json_path.is_file():
                local_meta = DatabaseMetadata.from_dict(json.loads(json_path.read_text()))
            else:
                local_meta = getattr(pickle.loads(db_path.read_bytes()), "metadata", None)

        if local_meta and local_meta.parsed_version >= remote_meta.parsed_version:
            return None

        gbk_bytes = _fetch(gbk_url)
        return db_name, gbk_bytes, toml_bytes

    @classmethod
    def _compile_and_save(cls, db_name: str, gbk_bytes: bytes, toml_bytes: bytes) -> Database:
        with TemporaryDirectory() as tmpdir:
            tmp_path = Path(tmpdir)
            (tmp_path / f"{db_name}.gbk").write_bytes(gbk_bytes)
            (tmp_path / f"{db_name}.toml").write_bytes(toml_bytes)
            db_obj = Database.from_genbank(tmp_path / f"{db_name}.gbk")
        cls.save(db_obj)
        return db_obj

    @classmethod
    def add(
        cls,
        owner: str,
        repo_name: str,
        db_name: str,
        branch: str = "main",
        local_meta: DatabaseMetadata | None = None,
    ) -> Database | None:
        fetched = cls._fetch_files(owner, repo_name, db_name, branch=branch, local_meta=local_meta)
        if fetched is None:
            return None
        return cls._compile_and_save(*fetched)

    @classmethod
    def load(cls, kwd: str) -> Database:
        return pickle.loads(cls._get_existing_db_path(kwd).read_bytes())

    @classmethod
    def get(cls, file_or_keyword: str | Path) -> Database:
        r"""Load from a path (``.gbk``/``.pkl``) or resolve a keyword (auto-installing)."""
        try:
            file_path = Path(file_or_keyword)
            if file_path.is_file():
                return Database.load(file_path)
        except (TypeError, ValueError, OSError):
            pass

        try:
            return cls.load(str(file_or_keyword))
        except DatabaseError:
            result = cls.install(str(file_or_keyword))
            if isinstance(result, list):
                result = result[0]
            if result is None:
                return cls.load(str(file_or_keyword))
            return result

    @classmethod
    def save(cls, db: Database) -> int:
        db_path = cls._get_db_path(db.metadata.keyword)
        db_path.with_suffix(".json").write_text(json.dumps(asdict(db.metadata)))
        return db_path.write_bytes(pickle.dumps(db, protocol=pickle.HIGHEST_PROTOCOL))
