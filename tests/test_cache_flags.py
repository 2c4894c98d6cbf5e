"""configure_xla_flags: the space-to-batch workaround must MERGE into a
user-supplied --xla_disable_hlo_passes list (XLA parses repeated flags
last-wins, so a second instance would silently clobber the user's list)."""
import os

from rtfs_net_tpu.utils.cache import configure_xla_flags


def test_appends_when_absent(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "--xla_foo=1")
    monkeypatch.delenv("RTFS_NO_XLA_WORKAROUNDS", raising=False)
    configure_xla_flags()
    assert os.environ["XLA_FLAGS"] == (
        "--xla_foo=1 --xla_disable_hlo_passes=space-to-batch-converter")


def test_merges_into_existing_disable_list(monkeypatch):
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_disable_hlo_passes=foo-pass --xla_bar=2")
    monkeypatch.delenv("RTFS_NO_XLA_WORKAROUNDS", raising=False)
    configure_xla_flags()
    flags = os.environ["XLA_FLAGS"].split()
    # ONE disable flag carrying both passes, other flags untouched
    disable = [f for f in flags if f.startswith("--xla_disable_hlo_passes=")]
    assert disable == [
        "--xla_disable_hlo_passes=foo-pass,space-to-batch-converter"]
    assert "--xla_bar=2" in flags


def test_idempotent(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "")
    monkeypatch.delenv("RTFS_NO_XLA_WORKAROUNDS", raising=False)
    configure_xla_flags()
    once = os.environ["XLA_FLAGS"]
    configure_xla_flags()
    assert os.environ["XLA_FLAGS"] == once


def test_opt_out(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "--xla_foo=1")
    monkeypatch.setenv("RTFS_NO_XLA_WORKAROUNDS", "1")
    configure_xla_flags()
    assert os.environ["XLA_FLAGS"] == "--xla_foo=1"
