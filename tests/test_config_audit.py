"""Config-field audit: every flag is consumed somewhere or explicitly dead.

Closes the silent-no-op flag class (VERDICT r2 weak #5: ``warm`` and
``num_iters`` were accepted and quietly ignored). A Config field must either
be read as an attribute somewhere in the package outside config.py, or be on
the explicit OBSOLETE list below with a reason.
"""

import dataclasses
import pathlib
import re

from cet_pick_tpu.config import Config

PKG = pathlib.Path(__file__).resolve().parents[1] / "cet_pick_tpu"

# Fields deliberately accepted-but-unused, with the reference citation for why.
OBSOLETE = {
    # dead in the reference too: unet_small.py:41 comments out the last_k
    # consumer; kept for flag-surface parity so old command lines still parse
    "last_k",
    # the reference threads opt.dataset through its dataset_factory; here the
    # dataset class is chosen by task (same derivation, opts.py:193-205), so
    # the field is parity-only
    "dataset",
    # num_workers sizes torch DataLoader worker pools; the prefetch pipeline
    # (data/prefetch.py) is single-background-thread by design on TPU hosts
    "num_workers",
}

# Derived fields written by finalize() — consumed widely, but exempt from the
# "outside config.py" rule being about *user flags*.
DERIVED = {"heads", "exp_dir", "save_dir", "debug_dir", "out_path"}

# User flags whose consumption IS finalize() itself: they feed the derived
# paths above (exp_dir/save_dir/out_path), which the package reads everywhere.
CONSUMED_IN_FINALIZE = {"exp_id", "out_id", "root_dir"}


def test_every_config_field_is_consumed():
    sources = [
        p.read_text()
        for p in PKG.rglob("*.py")
        if p.name != "config.py"
    ]
    blob = "\n".join(sources)
    missing = []
    for f in dataclasses.fields(Config):
        if f.name in OBSOLETE or f.name in DERIVED or f.name in CONSUMED_IN_FINALIZE:
            continue
        # attribute read anywhere in the package: `.name` not followed by `=`
        # (allow `==`), i.e. a read or a keyword-free access
        pat = re.compile(rf"\.{f.name}\b(?!\s*=[^=])")
        if not pat.search(blob):
            missing.append(f.name)
    assert not missing, (
        f"Config fields accepted but never read by the package (silent "
        f"no-op flags): {missing} — wire them or add to OBSOLETE with a "
        f"reason"
    )


def test_obsolete_list_is_not_stale():
    """If an OBSOLETE field gains a consumer, drop it from the list."""
    sources = [
        p.read_text() for p in PKG.rglob("*.py") if p.name != "config.py"
    ]
    blob = "\n".join(sources)
    stale = []
    for name in OBSOLETE:
        if re.search(rf"\.{name}\b(?!\s*=[^=])", blob):
            stale.append(name)
    assert not stale, f"OBSOLETE fields now consumed — remove from list: {stale}"
