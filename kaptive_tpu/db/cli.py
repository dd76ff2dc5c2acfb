r"""CLI command tree for database management: ``kaptive-tpu db ...``.

Capability parity with ``/root/reference/src/kaptive/db/cli.py``: the
``Database`` parent command (:28-51) with ``list``/``available``/``add``/
``install``/``update``/``reset``/``metadata`` and the ``extract`` tree with
``loci``/``genes``/``proteins`` FASTA dumps (:314-418).
"""

from __future__ import annotations

import argparse

from kaptive_tpu.cli import Colors, Command


class Database(Command):
    r"""📦 Manage local and remote reference databases.

    Aliases:
        db
    """

    aliases = ["db"]

    def register_subcommands(self) -> None:
        self.subcommands = [
            List(),
            Available(),
            Add(),
            Install(),
            Update(),
            Reset(),
            Extract(),
            Metadata(),
        ]


class List(Command):
    r"""📋 List all currently installed local databases.

    Aliases:
        ls
    """

    aliases = ["ls"]

    def __call__(self, args: argparse.Namespace) -> None:
        from kaptive_tpu.db import DatabaseManager

        if installed := DatabaseManager.installed():
            print("\n".join(installed))
        else:
            self.cli.msg("❌ No databases installed")


class Available(Command):
    r"""🌐 List all available official databases for installation.

    Aliases:
        avail
    """

    aliases = ["avail"]

    def __call__(self, args: argparse.Namespace) -> None:
        from kaptive_tpu.db import DatabaseManager

        if known := DatabaseManager.known():
            print("\n".join(known))
        else:
            self.cli.msg("❌ No available databases found")


class Install(Command):
    r"""📦 Install known reference databases via keyword."""

    def setup_arguments(self) -> None:
        opts = self.parser.add_argument_group("📥 Inputs")
        opts.add_argument("database", help="Database keyword (see: `kaptive-tpu db avail`) or 'all'")

    def __call__(self, args: argparse.Namespace) -> None:
        if args.database == "all":
            self.cli.msg("📥 Installing all known databases concurrently...")
        else:
            self.cli.msg(f"📥 Installing database '{args.database}'...")
        from kaptive_tpu.db import DatabaseManager

        DatabaseManager.install(args.database)
        if args.database == "all":
            self.cli.msg("✅ Successfully installed all known databases.")
        else:
            self.cli.msg(f"✅ Successfully installed '{args.database}'.")


class Update(Command):
    r"""🔄 Update installed local databases from remote repositories."""

    def setup_arguments(self) -> None:
        opts = self.parser.add_argument_group("📥 Inputs")
        opts.add_argument(
            "database",
            nargs="?",
            default="all",
            help="Database keyword (see: `kaptive-tpu db list`) or 'all' (default: all)",
        )

    def __call__(self, args: argparse.Namespace) -> None:
        if args.database == "all":
            self.cli.msg("🔄 Checking all installed databases for updates concurrently...")
        else:
            self.cli.msg(f"🔄 Checking '{args.database}' for updates...")
        from kaptive_tpu.db import DatabaseManager

        updated = False
        for db in DatabaseManager.update(args.database):
            self.cli.msg(f"✅ Updated {db.metadata.name} to version {db.metadata.version}")
            updated = True
        if not updated:
            self.cli.msg("🎉 All databases are already up to date.")


class Reset(Command):
    r"""🧹 Uninstall all local databases and reset local cache."""

    def __call__(self, args: argparse.Namespace) -> None:
        self.cli.msg("🧹 Uninstalling all local databases...")
        from kaptive_tpu.db import DatabaseManager

        DatabaseManager.reset()
        self.cli.msg("✅ All local databases have been uninstalled and reset.")


class Add(Command):
    r"""🔗 Add a custom reference database from a GitHub repository."""

    def setup_arguments(self) -> None:
        opts = self.parser.add_argument_group("📥 Inputs")
        opts.add_argument("database", help="Name for the new database")
        opts = self.parser.add_argument_group(Colors.wrap("🌐 GitHub Details", Colors.BOLD))
        opts.add_argument("owner", help="GitHub repository owner")
        opts.add_argument("repo_name", help="GitHub repository name")
        opts.add_argument(
            "-b", "--branch", help="GitHub repository branch (default: main)", default="main", nargs="?"
        )

    def __call__(self, args: argparse.Namespace) -> None:
        from kaptive_tpu.db import DatabaseManager

        self.cli.msg(f"⤵️ Adding {args.database} from {args.owner}/{args.repo_name}/{args.branch}")
        if db := DatabaseManager.add(args.owner, args.repo_name, args.database, args.branch):
            self.cli.msg(f"✅ Added {db.metadata.name} v{db.metadata.version} successfully!")
        else:
            self.cli.msg("❌ Failed to add database! Is it already installed?")


class Metadata(Command):
    r"""📊 Print detailed metadata of a reference database.

    Aliases:
        info
    """

    aliases = ["info"]

    def setup_arguments(self) -> None:
        opts = self.parser.add_argument_group("📥 Inputs")
        opts.add_argument("database", help="Database path or keyword (see: `kaptive-tpu db list`)")

    def __call__(self, args: argparse.Namespace) -> None:
        from kaptive_tpu.db import DatabaseManager

        db = DatabaseManager.get(args.database)
        meta = db.metadata
        fields = [
            ("Organism", meta.organism),
            ("Taxon", str(meta.taxon)),
            ("Antigen", meta.antigen),
            ("Pathway", meta.pathway),
            ("Version", meta.version),
            ("Keyword", meta.keyword),
            ("Threshold", f"{meta.id_threshold}%"),
            ("GenBank", meta.genbank),
            ("DOIs", ", ".join(meta.doi) if meta.doi else "None"),
            ("Repository", f"https://github.com/{meta.owner}/{meta.repo}/tree/{meta.branch}"),
            ("Contact", ", ".join(f"{k} <{v}>" for k, v in meta.contact.items())),
        ]
        max_len = max(len(k) for k, v in fields)
        print(
            Colors.wrap(f"\n📊 Metadata for {meta.name}\n", Colors.BOLD_CYAN)
            + "\n".join(f"  {Colors.wrap(k.ljust(max_len), Colors.BOLD)}  {v}" for k, v in fields)
            + "\n"
        )


class Extract(Command):
    r"""📤 Extract database records in FASTA format."""

    def register_subcommands(self) -> None:
        self.subcommands = [Loci(), Genes(), Proteins()]

    def get_shared_parser(self) -> argparse.ArgumentParser:
        parser = argparse.ArgumentParser(add_help=False)
        opts = parser.add_argument_group("📥 Inputs")
        opts.add_argument("database", help="Database path or keyword (see: `kaptive-tpu db list`)")
        opts = parser.add_argument_group("📤 Outputs")
        opts.add_argument(
            "-o", "--out", default="-", metavar="FILE",
            help="Output file to write fasta to (default: stdout)",
        )
        opts.add_argument(
            "--use-indices", action="store_true",
            help="Use numeric indices instead of string IDs for fasta headers",
        )
        return parser


class _ExtractRecords(Command):
    r"""Shared extract implementation: subclasses name the database record set."""

    record_attr = ""  # Database attribute holding the Sequences batch
    noun = ""  # human label for messages

    def __call__(self, args: argparse.Namespace) -> None:
        self.cli.msg(f"💽 Loading database {args.database}...")
        from kaptive_tpu.db import DatabaseManager

        db = DatabaseManager.get(args.database)
        out_handle = self.cli.open_file(args.out, "wb")
        self.cli.msg(f"📤 Extracting {self.noun}...")
        out_handle.write(getattr(db, self.record_attr).to_fasta(args.use_indices))
        self.cli.msg(f"✅ Written {self.noun} sequences to {args.out}.")


class Loci(_ExtractRecords):
    r"""🧬 Extract locus nucleotide sequences in FASTA format."""

    record_attr, noun = "loci", "locus"


class Genes(_ExtractRecords):
    r"""🧩 Extract gene coding sequences in FASTA format."""

    record_attr, noun = "genes", "gene"


class Proteins(_ExtractRecords):
    r"""🧶 Extract translated protein sequences in FASTA format."""

    record_attr, noun = "translations", "protein"
