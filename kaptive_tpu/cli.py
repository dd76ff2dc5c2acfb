r"""Command line framework and root runner.

Capability parity with ``/root/reference/src/kaptive/cli.py``: ANSI color
namespace (:22-67), colorized help formatter (:70-140), help-on-error parser
with did-you-mean suggestions (:143-168), the ``Cli`` host with file-handle
tracking, exit-code mapping, verbose messages and a progress counter
(:171-363), the declarative ``Command`` base auto-deriving name/description/
help from class metadata with nested subcommand wiring (:366-569), and
``main()`` (:571-587).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from abc import ABC
from collections.abc import Iterable
from pathlib import Path
from typing import IO, Any, Self

from kaptive_tpu import __version__


class Colors:
    r"""ANSI escape namespace; disabled when not a TTY or ``NO_COLOR`` is set."""

    ENABLED = sys.stdout.isatty() and not os.environ.get("NO_COLOR")

    def __init__(self) -> None:
        raise TypeError("The Colors class is a namespace and cannot be instantiated.")

    RESET = "\033[0m"
    BOLD = "\033[1m"
    BOLD_RED = "\033[1;31m"
    BOLD_CYAN = "\033[1;36m"

    @classmethod
    def wrap(cls, text: str, *styles: str) -> str:
        if not cls.ENABLED:
            return text
        return f"{''.join(styles)}{text}{cls.RESET}"


class CliHelpFormatter(argparse.RawTextHelpFormatter):
    r"""Help formatter with colorized headings and compacted subcommand usage."""

    def _format_usage(self, usage, actions, groups, prefix):
        positionals = [a for a in actions if not a.option_strings]
        result = super()._format_usage(usage, positionals, groups, prefix)
        result = re.sub(r"\{[a-zA-Z0-9_,\.-]+\}", Colors.wrap("[subcommand]", Colors.BOLD_CYAN), result)
        actual_prefix = prefix if prefix is not None else "usage: "
        target = f"{actual_prefix}{self._prog}"
        if result.startswith(target):
            if any(a.option_strings for a in actions):
                colored_options = Colors.wrap("[options]", Colors.BOLD_CYAN)
                result = result.replace(target, f"{target} {colored_options}", 1)
            result = result.replace(actual_prefix, Colors.wrap(actual_prefix, Colors.BOLD_CYAN), 1)
        return result

    def start_section(self, heading):
        if heading:
            heading = Colors.wrap(heading, Colors.BOLD_CYAN)
        super().start_section(heading)

    def _format_action(self, action):
        result = super()._format_action(action)
        if type(action).__name__ == "_SubParsersAction":
            lines = result.split("\n", 1)
            if len(lines) > 1:
                result = lines[1]
        return result


def _closest_choice(message: str) -> str | None:
    r"""Extract the misspelled choice from an argparse error and fuzzy-match it
    against the offered alternatives; returns the best candidate, if any."""
    bad = re.search(r"invalid choice: '?([^']+)'?", message)
    offered = re.search(r"\(choose from (.*)\)", message)
    if not (bad and offered):
        return None
    from difflib import get_close_matches

    candidates = [c.strip(" '\"") for c in offered.group(1).split(",")]
    hits = get_close_matches(bad.group(1), candidates, n=1)
    return hits[0] if hits else None


class HelpOnErrorParser(argparse.ArgumentParser):
    r"""Parser that shows full help plus a fuzzy suggestion when parsing fails."""

    def error(self, message: str) -> None:  # type: ignore[override]
        self.print_help(sys.stderr)
        lines = [f"{Colors.wrap('Error:', Colors.BOLD_RED)} {message}"]
        if suggestion := _closest_choice(message):
            lines.append(f"  hint: did you mean {Colors.wrap(suggestion, Colors.BOLD_CYAN)}?")
        self.exit(2, "\n" + "\n".join(lines) + "\n")


def _rename_option_group(parser: argparse.ArgumentParser, demote: bool) -> None:
    r"""Retitle argparse's default optionals group; ``demote`` moves it last in
    the help output so command-specific groups print first."""
    group = getattr(parser, "_optionals", None)
    if group is None:
        return
    group.title = Colors.wrap("General options", Colors.BOLD)
    if demote and group in parser._action_groups:
        parser._action_groups.remove(group)
        parser._action_groups.append(group)


class Cli:
    r"""Root CLI host: global options, subcommand registry, handles, progress."""

    def __init__(self, description: str | None = None, epilog: str | None = None) -> None:
        self.verbose = False
        self.global_parser = HelpOnErrorParser(add_help=False)
        self.global_parser.add_argument(
            "-V", "--verbose", action="store_true", help="Enable verbose output/progress"
        )

        self.parser = HelpOnErrorParser(
            description=Colors.wrap(description, Colors.BOLD) if description else description,
            epilog=Colors.wrap(epilog, Colors.BOLD) if epilog else epilog,
            parents=[self.global_parser],
            formatter_class=CliHelpFormatter,
        )
        self.parser.add_argument(
            "-v",
            "--version",
            action="version",
            version=f"%(prog)s {__version__}",
            help="Show program's version number and exit",
        )
        _rename_option_group(self.parser, demote=False)

        self.subparsers = self.parser.add_subparsers(
            title=Colors.wrap("Commands", Colors.BOLD), dest="command", required=True
        )
        self._open_handles: list[IO] = []

    def add_command(self, command: "Command") -> None:
        command.cli = self
        command.build(self.subparsers, parent_parsers=[self.global_parser])

    def run(self, args: list[str] | None = None) -> None:
        parsed_args = self.parser.parse_args(args)
        self.verbose = getattr(parsed_args, "verbose", False)
        if hasattr(parsed_args, "func"):
            from kaptive_tpu.client import KaptiveWebClientError
            from kaptive_tpu.db import DatabaseError

            try:
                parsed_args.func(parsed_args)
            except (DatabaseError, KaptiveWebClientError) as e:
                print(f"❌ {e}", file=sys.stderr)
                sys.exit(1)
        else:
            self.parser.print_help()

    def __enter__(self) -> Self:
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        self.cleanup()
        if exc_type is KeyboardInterrupt:
            print("\n🛑 Cancelled by user.", file=sys.stderr)
            sys.exit(1)
        elif exc_type is BrokenPipeError:
            devnull = os.open(os.devnull, os.O_WRONLY)
            os.dup2(devnull, sys.stdout.fileno())
            sys.exit(130)
        elif exc_type is PermissionError:
            print(f"🔒 Permission denied: {exc_val}", file=sys.stderr)
            sys.exit(1)
        elif exc_type is FileNotFoundError:
            print(f"📄 File not found: {exc_val}", file=sys.stderr)
            sys.exit(1)

    def exit(self, msg: str, code: int = 1) -> None:
        print(f"❌ {msg}", file=sys.stderr)
        sys.exit(code)

    def __del__(self) -> None:
        self.cleanup()

    def cleanup(self) -> None:
        for handle in self._open_handles:
            if handle not in (sys.stdout, sys.stdin, sys.stderr):
                handle.close()
        self._open_handles.clear()

    def msg(self, msg: str | None, **kwargs: Any) -> None:
        if self.verbose:
            print(msg, file=sys.stderr, **kwargs)

    def progress(self, iterable: Iterable, msg: str) -> Iterable:
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = "?"
        for i, item in enumerate(iterable, start=1):
            if self.verbose:
                print(f"\r{msg} {i}/{total}", end="", file=sys.stderr, flush=True)
            yield item
        if self.verbose:
            print(file=sys.stderr)

    def open_file(self, file: str, mode: str = "rb") -> IO:
        r"""Open a path, or pass through the standard streams: ``-`` means
        stdin when reading and stdout when writing; ``stdin``/``stdout`` name
        them explicitly.  Real files are tracked for cleanup."""
        reading = "r" in mode
        if file == "stdin" or (file == "-" and reading):
            return sys.stdin.buffer if "b" in mode else sys.stdin
        if file == "stdout" or (file == "-" and not reading):
            return sys.stdout.buffer if "b" in mode else sys.stdout
        handle = open(file, mode)
        self._open_handles.append(handle)
        return handle


class Command(ABC):
    r"""Declarative CLI subcommand: name/description derived from class metadata."""

    name: str = ""
    aliases: list[str] = []
    description: str = ""
    help_text: str = ""

    def __init__(self) -> None:
        self.parser: argparse.ArgumentParser | None = None
        self.subcommands: list[Command] = []
        self.cli: Cli | None = None

        if not self.name:
            self.name = type(self).__name__.lower()
        if not self.description:
            if type(self).__doc__ and type(self).__doc__ != Command.__doc__:
                self.description = type(self).__doc__  # type: ignore[assignment]
        if not self.help_text and self.description:
            self.help_text = self.description.strip().split("\n")[0]
        self.register_subcommands()

    def register_subcommands(self) -> None:
        pass

    def setup_arguments(self) -> None:
        pass

    def get_shared_parser(self) -> argparse.ArgumentParser | None:
        return None

    def add_output_arguments(
        self,
        opts: argparse._ArgumentGroup,
        tsv_flags: tuple[str, str] = ("-o", "--out"),
        include_json: bool = True,
    ) -> None:
        help_msg = (
            "Write serotyping results as a TSV report to a file (default: %(default)s)"
            if tsv_flags[0] == "-o"
            else "Write serotyping results as a TSV report to a file (default: %(const)s)"
        )
        opts.add_argument(
            tsv_flags[0],
            tsv_flags[1],
            metavar="FILE",
            nargs="?" if tsv_flags[0] == "-t" else None,
            default="stdout" if tsv_flags[0] == "-o" else None,
            const="stdout" if tsv_flags[0] == "-t" else None,
            help=help_msg,
        )
        opts.add_argument(
            "-l", "--loci", metavar="DIR", nargs="?", const="./", type=Path,
            help="Write locus nucleotide fasta files to a directory (default: %(const)s)",
        )
        opts.add_argument(
            "-g", "--genes", metavar="DIR", nargs="?", const="./", type=Path,
            help="Write gene nucleotide fasta files to a directory (default: %(const)s)",
        )
        opts.add_argument(
            "-p", "--proteins", metavar="DIR", nargs="?", const="./", type=Path,
            help="Write translation amino-acid fasta files to a directory (default: %(const)s)",
        )
        if include_json:
            opts.add_argument(
                "-j", "--json", metavar="FILE", nargs="?", const="kaptive_results.jsonl",
                help="Write serialised results to a newline-delimited JSON (default: %(const)s)",
            )
        opts.add_argument(
            "--pha4ge", metavar="FILE", nargs="?", const="kaptive_results.pha4ge", type=Path,
            help="Write PHA4GE-compliant serotyping report to a TSV file (default: %(const)s)",
        )
        opts.add_argument(
            "--plots", metavar="DIR", nargs="?", const="./", type=Path,
            help="Generate interactive locus plots to a directory (default: %(const)s)",
        )

    def __call__(self, args: argparse.Namespace) -> None:
        pass

    @property
    def _runnable(self) -> bool:
        r"""Whether this command has its own action (vs being a pure group)."""
        return type(self).__call__ is not Command.__call__

    def build(
        self,
        subparsers: argparse._SubParsersAction,
        parent_parsers: list[argparse.ArgumentParser] | None = None,
    ) -> None:
        inherited = list(parent_parsers or [])
        self.parser = subparsers.add_parser(
            name=self.name,
            aliases=self.aliases,
            description=Colors.wrap(self.description, Colors.BOLD),
            help=self.help_text or self.description,
            parents=inherited,
            formatter_class=CliHelpFormatter,
        )
        self.setup_arguments()
        _rename_option_group(self.parser, demote=True)
        if self._runnable:
            self.parser.set_defaults(func=self.__call__)
        if self.subcommands:
            self._wire_children(inherited)

    def _wire_children(self, inherited: list[argparse.ArgumentParser]) -> None:
        r"""Attach child commands; a pure command group requires one of them."""
        registry = self.parser.add_subparsers(
            title=Colors.wrap(f"{self.name} subcommands", Colors.BOLD),
            dest=f"{self.name}_subcommand",
            required=not self._runnable,
        )
        if shared := self.get_shared_parser():
            inherited = [*inherited, shared]
        for child in self.subcommands:
            child.cli = self.cli
            child.build(registry, parent_parsers=inherited)


def main() -> None:
    r"""Entry point for the ``kaptive-tpu`` console script."""
    from kaptive_tpu.db.cli import Database
    from kaptive_tpu.serotyping.cli import Convert, Type

    description = "🦠 kaptive-tpu: TPU-native in silico serotyping of surface antigen loci."
    epilog = "📚 A TPU-native framework with the capabilities of Kaptive 3."

    with Cli(description=description, epilog=epilog) as app:
        app.add_command(Database())
        app.add_command(Type())
        app.add_command(Convert())
        app.run()


if __name__ == "__main__":
    main()
