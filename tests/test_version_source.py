"""Package-version resolution (reference: tests/test_version_source.py).

__version__ comes from installed-distribution metadata when available and
falls back to the pyproject-pinned value when driven from source.
"""

import waveformanalysis_tpu
from waveformanalysis_tpu import cli


def test_init_version_reads_metadata(monkeypatch):
    monkeypatch.setattr(waveformanalysis_tpu, "package_version",
                        lambda _: "1.2.3")
    assert waveformanalysis_tpu._resolve_package_version() == "1.2.3"


def test_init_version_fallback_when_package_not_installed(monkeypatch):
    def _raise(_):
        raise waveformanalysis_tpu.PackageNotFoundError

    monkeypatch.setattr(waveformanalysis_tpu, "package_version", _raise)
    assert (waveformanalysis_tpu._resolve_package_version()
            == waveformanalysis_tpu._FALLBACK_VERSION)


def test_cli_version_reads_metadata(monkeypatch):
    monkeypatch.setattr(cli, "package_version", lambda _: "2.3.4")
    assert cli._pkg_version() == "2.3.4"


def test_cli_version_fallback_when_package_not_installed(monkeypatch):
    def _raise(_):
        raise cli.PackageNotFoundError

    monkeypatch.setattr(cli, "package_version", _raise)
    assert cli._pkg_version() == waveformanalysis_tpu._FALLBACK_VERSION


def test_cli_version_flag_exits_zero(capsys):
    import pytest

    with pytest.raises(SystemExit) as exc:
        cli.build_parser().parse_args(["--version"])
    assert exc.value.code == 0
    assert "waveform-process" in capsys.readouterr().out
