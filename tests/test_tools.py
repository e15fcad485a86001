"""Tests for the repo tooling (tools/*.py) that the gates depend on."""

import importlib.util
import json
import os


def _load_check_oracles():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "check_oracles.py",
    )
    spec = importlib.util.spec_from_file_location("_check_oracles_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_driver_coverage_sorts_rounds_numerically(tmp_path, monkeypatch):
    """'Later rounds win' must follow the parsed round number: lexicographic
    filename order puts CORRECTNESS_r10 before CORRECTNESS_r9, so an older
    round would overwrite a newer one in the manifest (r4 ADVICE)."""
    mod = _load_check_oracles()
    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    red = {"rows_match": False, "schema_match": True, "hash_match": False}
    # r9 green, r10 green -> r10 must win even though "r10" < "r9" as text
    (tmp_path / "CORRECTNESS_r9.json").write_text(json.dumps({"q": green}))
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps({"q": green}))
    # a red row never vouches, whatever the round
    (tmp_path / "CORRECTNESS_r11.json").write_text(json.dumps({"q": red}))
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    assert mod.driver_coverage() == {"q": "r10"}
