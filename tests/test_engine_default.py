"""Commit-engine default and overrides (round 5).

The one-pass device RD commit is byte-identical to the native C++
committer at clip scale (results/engine_ab.json) but the refreshed
native pipeline still wins the wall clock at every measured geometry
(CIF 4.4 vs 1.57 fps, 1080p 0.350 vs 0.324, 4K 0.134 vs 0.079 —
results/*.json), so the default is 'native' everywhere and must stay
overridable by env/argument.
"""
import pytest

from wrenc_tpu.core.config import EncoderConfig
from wrenc_tpu.search import WavefrontSearch


@pytest.mark.parametrize("w,h", [
    (352, 288), (1920, 1088), (3840, 2176), (64, 64),
])
def test_default_engine_native(w, h, monkeypatch):
    monkeypatch.delenv('WRENC_COMMIT_ENGINE', raising=False)
    ws = WavefrontSearch(EncoderConfig(width=w, height=h, qp=32))
    assert ws.commit_engine == 'native'
    assert not ws._device_commit


def test_env_and_argument_override(monkeypatch):
    monkeypatch.setenv('WRENC_COMMIT_ENGINE', 'device')
    ws = WavefrontSearch(EncoderConfig(width=352, height=288, qp=32))
    assert ws.commit_engine == 'device'
    assert ws._device_commit
    monkeypatch.delenv('WRENC_COMMIT_ENGINE', raising=False)
    ws = WavefrontSearch(EncoderConfig(width=1920, height=1088, qp=32),
                         commit_engine='device')
    assert ws.commit_engine == 'device'
