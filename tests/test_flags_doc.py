"""Flag documentation sync: every user flag has help text, and docs/flags.md
is the committed output of `cet_pick_tpu flags` (regenerate after config
changes with `python -m cet_pick_tpu flags --out docs/flags.md`)."""

import dataclasses
import pathlib

from cet_pick_tpu.cli.common import FLAG_GROUPS, FLAG_HELP, flags_markdown
from cet_pick_tpu.config import Config

REPO = pathlib.Path(__file__).resolve().parents[1]
DERIVED = {"heads", "exp_dir", "save_dir", "debug_dir", "out_path"}


def test_every_flag_has_help():
    fields = {f.name for f in dataclasses.fields(Config)} - DERIVED
    missing = fields - set(FLAG_HELP)
    extra = set(FLAG_HELP) - fields
    assert not missing, f"Config fields without FLAG_HELP entries: {missing}"
    assert not extra, f"FLAG_HELP entries for nonexistent fields: {extra}"


def test_no_flag_documented_twice():
    names = [k for _, group in FLAG_GROUPS for k in group]
    dupes = {n for n in names if names.count(n) > 1}
    assert not dupes, f"flags documented in multiple groups: {dupes}"


def test_flags_doc_in_sync():
    committed = (REPO / "docs" / "flags.md").read_text()
    assert committed == flags_markdown(), (
        "docs/flags.md is stale — regenerate with "
        "`python -m cet_pick_tpu flags --out docs/flags.md`"
    )


def test_help_reaches_argparse(capsys):
    import argparse

    from cet_pick_tpu.cli.common import add_config_arguments

    parser = add_config_arguments(argparse.ArgumentParser())
    help_text = parser.format_help()
    assert "InfoNCE temperature" in help_text
    assert "(default: 0.07)" in help_text


def test_flags_cli_writes_page(tmp_path, capsys):
    from cet_pick_tpu.__main__ import main

    out = tmp_path / "flags.md"
    rc = main(["flags", "--out", str(out)])
    assert rc in (0, None)
    assert out.read_text() == flags_markdown()
    rc = main(["flags"])
    assert rc in (0, None)
    assert "# Flag reference" in capsys.readouterr().out
