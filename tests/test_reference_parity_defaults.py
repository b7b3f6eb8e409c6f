"""Default-configuration parity against the ACTUAL reference lib/config.py.

``resdepth_tpu/config/defaults.py`` claims to mirror the reference defaults
section by section; this test loads the real ``lib/config.py`` and asserts
(a) every reference default key exists here with an equal value, and (b) the
keys we add beyond the reference are exactly the documented TPU extensions —
so any drift on either side is caught, not just the keys we remembered.

Skipped automatically when /root/reference is absent.
"""

import os

import pytest

from tests.test_reference_parity_numerics import _load_with_stubs

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference implementation not available")

# Keys we add on top of the reference defaults tree, with why.
EXTRA_KEYS = {
    ("model", "max_filter_depth"),   # hard-coded 512 in lib/UNet.py:152-155
    ("tpu", None),                   # whole TPU-native section
}


def _flatten(tree, prefix=()):
    out = {}
    for key, value in tree.items():
        if isinstance(value, dict):
            if not value:
                out[prefix + (key,)] = dict(value)
            else:
                out.update(_flatten(value, prefix + (key,)))
        else:
            out[prefix + (key,)] = value
    return out


def test_defaults_tree_matches_reference():
    from resdepth_tpu.config.defaults import default_cfg

    ref_cfg = _load_with_stubs("lib/config.py", "ref_defaults").cfg
    ours = _flatten(default_cfg())
    theirs = _flatten(ref_cfg)

    for path, ref_value in theirs.items():
        assert path in ours, f"reference default missing here: {'.'.join(path)}"
        assert ours[path] == ref_value, (
            f"default value drift at {'.'.join(path)}: "
            f"ours={ours[path]!r}, reference={ref_value!r}")

    unexpected = []
    for path in ours:
        if path in theirs:
            continue
        if (path[0], None) in EXTRA_KEYS or path[:2] in EXTRA_KEYS:
            continue
        unexpected.append(".".join(path))
    assert not unexpected, (
        "undocumented default keys beyond the reference tree: "
        f"{unexpected} — extend EXTRA_KEYS only with a reason")
