"""Every CLI app imports and parses --help (catches app-level import and
argparse regressions without running hardware paths)."""

import importlib

import pytest

APPS = [
    "am_decode", "ax25_1200_rx", "ax25_1200_wpcr", "ax25_9600_rx",
    "ax25_9600_wpcr", "bell202_tx", "burst_saver", "capture", "fm_tx",
    "g3ruh", "il2p_1200_rx", "morse_beacon", "pw_tone", "rtl_data_stream", "rtl_fm",
    "scanner", "soapy_fm", "spectrum", "tone", "ui_server",
]


@pytest.mark.parametrize("name", APPS)
def test_app_help(name, capsys):
    mod = importlib.import_module(f"rustradio_tpu.apps.{name}")
    with pytest.raises(SystemExit) as e:
        mod.main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "usage" in out.lower()
