"""CLI flag contracts (argparse level, no pipeline execution)."""

import pytest


def _nw_parser_args(argv):
    """Drive nw_main only through its argparse stage (a spy parse_args
    captures the namespace and aborts before any pipeline work)."""
    from neighborhoodwatch_tpu import cli

    captured = {}

    class _Stop(Exception):
        pass

    real = cli.argparse.ArgumentParser.parse_args

    def spy(self, a=None):
        ns = real(self, argv if a is None else a)
        captured.update(vars(ns))
        raise _Stop
    cli.argparse.ArgumentParser.parse_args = spy
    try:
        with pytest.raises(_Stop):
            cli.nw_main(argv)
    finally:
        cli.argparse.ArgumentParser.parse_args = real
    return captured


def test_mesh_flag_parses():
    args = _nw_parser_args(["10", "100", "-m", "intfloat/e5-small-v2",
                            "--mesh", "4"])
    assert args["mesh"] == 4


def test_engine_choices():
    args = _nw_parser_args(["10", "100", "-m", "intfloat/e5-small-v2",
                            "--engine", "screened", "--metric", "cosine"])
    assert args["engine"] == "screened" and args["metric"] == "cosine"


def test_confirm_survives_noninteractive_and_case(monkeypatch):
    """The post-validation prompt must not crash with EOFError on a
    closed stdin (nohup/scripted runs after an expensive generation) and
    must accept 'Y'/'YES ' (r3 review)."""
    from neighborhoodwatch_tpu.cli import _confirm

    def eof(prompt):
        raise EOFError

    monkeypatch.setattr("builtins.input", eof)
    assert _confirm("go? ") is False            # skip, don't crash

    for answer, want in [("Y", True), (" yes ", True), ("YES", True),
                         ("n", False), ("No", False), ("", False)]:
        monkeypatch.setattr("builtins.input", lambda p, a=answer: a)
        assert _confirm("go? ") is want, answer
