"""CLI end-to-end differential: `waveform-process` vs the reference's
`cli.main` over the same synthetic run directory.

The one user-facing surface the data-level oracle never crosses: argument
parsing, profile registration, Context wiring, df_paired computation and
the CSV/parquet export path (reference:
/root/reference/waveform_analysis/cli.py:23-230). Both mains run
in-process over an identical VX2730 run dir; the exported tables must
match column-for-column (reference columns are a subset of ours — we also
export identity columns the reference drops).
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest

import test_reference_differential as base  # noqa: E402

pytestmark = pytest.mark.slow

N_ROWS = 60


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    base._import_reference()
    tmp = tmp_path_factory.mktemp("diff_cli")
    from waveformanalysis_tpu.testing.fixtures import make_synthetic_vx2730_run

    make_synthetic_vx2730_run(
        str(tmp / "DAQ"), "run_cli", n_channels=2, n_rows=N_ROWS,
        n_samples=96, noise=5, seed=21,
    )
    return tmp


def _run_reference_cli(tmp, out_path, extra_args=()):
    """Drive the reference's argparse main in-process, sandboxed to tmp."""
    from waveform_analysis import cli as ref_cli

    workdir = tmp / "ref_cwd"
    workdir.mkdir(exist_ok=True)
    argv = [
        "waveform-process", "--run-name", "run_cli",
        "--daq-root", str(tmp / "DAQ"),
        "--output", str(out_path), *extra_args,
    ]
    old_argv, old_cwd = sys.argv, os.getcwd()
    try:
        sys.argv = argv
        os.chdir(workdir)  # its Context drops caches relative to cwd
        rc = ref_cli.main()
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
    assert rc == 0, f"reference CLI failed rc={rc}"
    return pd.read_csv(out_path) if out_path.suffix == ".csv" \
        else pd.read_parquet(out_path)


def _run_our_cli(tmp, out_path, extra_args=(), sub="our"):
    from waveformanalysis_tpu.cli import main as our_main

    rc = our_main([
        "--run-name", "run_cli",
        "--data-root", str(tmp / "DAQ"),
        "--storage-dir", str(tmp / f"{sub}_storage"),
        "--output", str(out_path), "--quiet", *extra_args,
    ])
    assert rc == 0, f"our CLI failed rc={rc}"
    return pd.read_csv(out_path) if out_path.suffix == ".csv" \
        else pd.read_parquet(out_path)


def _sorted(df):
    key = [c for c in ("time_ch6", "timestamp", "time") if c in df.columns]
    return df.sort_values(key or list(df.columns)[:1]).reset_index(drop=True)


def _assert_frames_match(rdf, odf, tag):
    rdf, odf = _sorted(rdf), _sorted(odf)
    assert len(rdf) == len(odf) > 0, f"{tag}: {len(rdf)} vs {len(odf)} rows"
    ref_cols = set(rdf.columns) - base.ID_FIELDS
    our_cols = set(odf.columns) - base.ID_FIELDS
    assert ref_cols <= our_cols, (
        f"{tag}: missing columns {ref_cols - our_cols}"
    )
    for c in sorted(ref_cols):
        rv, ov = rdf[c].to_numpy(), odf[c].to_numpy()
        if rv.dtype == object:
            for i, (a, b) in enumerate(zip(rv, ov)):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"{tag}.{c}[{i}]",
                )
        elif rv.dtype.kind == "f":
            np.testing.assert_array_equal(
                np.isnan(rv), np.isnan(ov), err_msg=f"{tag}.{c} NaN mask"
            )
            np.testing.assert_allclose(
                np.nan_to_num(rv), np.nan_to_num(ov), rtol=0, atol=0,
                err_msg=f"{tag}.{c}",
            )
        else:
            np.testing.assert_array_equal(rv, ov, err_msg=f"{tag}.{c}")


def test_cli_csv_default_options(run_dir):
    """Out-of-the-box invocation: same df_paired CSV (incl. the global
    start_channel_slice=6 default -> area_ch6/7 columns)."""
    rdf = _run_reference_cli(run_dir, run_dir / "ref_default.csv")
    odf = _run_our_cli(run_dir, run_dir / "our_default.csv", sub="our_def")
    assert any(c.startswith("area_ch6") for c in rdf.columns), \
        "reference lost its ch6 default — revisit PARITY"
    _assert_frames_match(rdf, odf, "cli_default")


def test_cli_csv_time_window_and_start_channel(run_dir):
    """Non-default --time-window and --start-channel flow through both
    CLIs to the same pairing."""
    extra = ("--time-window", "250", "--start-channel", "0")
    rdf = _run_reference_cli(run_dir, run_dir / "ref_tw.csv",
                             extra_args=extra)
    odf = _run_our_cli(run_dir, run_dir / "our_tw.csv", extra_args=extra,
                       sub="our_tw")
    assert any(c.startswith("area_ch0") for c in rdf.columns)
    _assert_frames_match(rdf, odf, "cli_tw")


def test_cli_parquet_export(run_dir):
    rdf = _run_reference_cli(run_dir, run_dir / "ref_out.parquet")
    odf = _run_our_cli(run_dir, run_dir / "our_out.parquet", sub="our_pq")
    _assert_frames_match(rdf, odf, "cli_parquet")
