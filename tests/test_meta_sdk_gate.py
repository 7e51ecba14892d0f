"""Interface-parity and import-gate tests for the real Meta SDK transport.

The sandbox has no ``facebook_business``, so the real-transport class can
only be checked structurally: it must expose exactly the transport methods
``MetaRestSource`` calls (same names, same signatures as the fake), and it
must fail with a clear ImportError — not an AttributeError deep inside a
query — when the SDK is absent.
"""

from __future__ import annotations

import inspect

import pytest

from projeto_de_etl_com_api_do_meta_spark.sources import meta_sdk
from projeto_de_etl_com_api_do_meta_spark.sources.meta_rest import FakeMetaTransport
from projeto_de_etl_com_api_do_meta_spark.sources.meta_sdk import (
    TRANSPORT_METHODS,
    RealMetaTransport,
    make_transport,
    sdk_available,
)


def test_interface_parity_fake_vs_real():
    """Both transports expose the same methods with identical signatures
    (excluding the fixture-only helpers the fake may carry)."""
    for name in TRANSPORT_METHODS:
        fake_fn = getattr(FakeMetaTransport, name)
        real_fn = getattr(RealMetaTransport, name)
        assert inspect.signature(fake_fn) == inspect.signature(real_fn), name


def test_real_transport_gates_cleanly_without_sdk():
    if sdk_available():  # pragma: no cover - sandbox has no SDK
        pytest.skip("facebook_business installed; gate path not reachable")
    with pytest.raises(ImportError, match="facebook_business"):
        RealMetaTransport()


def test_make_transport_falls_back_to_fake(monkeypatch):
    monkeypatch.delenv("ACCESS_TOKEN", raising=False)
    t = make_transport()
    assert isinstance(t, FakeMetaTransport)


def test_make_transport_forced_real_raises_without_sdk():
    if sdk_available():  # pragma: no cover
        pytest.skip("facebook_business installed; gate path not reachable")
    with pytest.raises(ImportError):
        make_transport(prefer_real=True)


def test_sdk_available_reports_bool():
    assert meta_sdk.sdk_available() in (True, False)
