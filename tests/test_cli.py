"""CLI entry-point contracts: WAV validation and platform re-exec argv.

The reference ships a desktop launcher; this framework's headless CLI
(`audioforge_tpu/__main__.py`) must validate inputs strictly (a 24-bit or
float WAV silently reinterpreted as int16 produces garbage audio) and the
``--platform`` re-exec must never eat a positional argument that happens
to equal the platform string.
"""

import wave

import numpy as np
import pytest

from audioforge_tpu.__main__ import _read_wav_48k_mono, _strip_platform_args


def _write_wav(path, *, rate=48000, channels=1, sampwidth=2, frames=480):
    with wave.open(str(path), "wb") as handle:
        handle.setnchannels(channels)
        handle.setsampwidth(sampwidth)
        handle.setframerate(rate)
        handle.writeframes(b"\x00" * (frames * channels * sampwidth))


class TestReadWav:
    def test_accepts_16bit_48k_mono(self, tmp_path):
        p = tmp_path / "ok.wav"
        _write_wav(p)
        audio = _read_wav_48k_mono(p)
        assert audio.dtype == np.float32 and audio.size == 480

    def test_rejects_24bit(self, tmp_path):
        p = tmp_path / "deep.wav"
        _write_wav(p, sampwidth=3)
        with pytest.raises(ValueError, match="16-bit PCM"):
            _read_wav_48k_mono(p)

    def test_rejects_float32_width(self, tmp_path):
        p = tmp_path / "float.wav"
        _write_wav(p, sampwidth=4)
        with pytest.raises(ValueError, match="16-bit PCM"):
            _read_wav_48k_mono(p)

    def test_rejects_wrong_rate_and_channels(self, tmp_path):
        p = tmp_path / "bad.wav"
        _write_wav(p, rate=44100)
        with pytest.raises(ValueError, match="48 kHz mono"):
            _read_wav_48k_mono(p)
        _write_wav(p, channels=2)
        with pytest.raises(ValueError, match="48 kHz mono"):
            _read_wav_48k_mono(p)


class TestStripPlatformArgs:
    def test_drops_option_and_value(self):
        assert _strip_platform_args(
            ["--platform", "cpu", "serve", "a.wav"]) == ["serve", "a.wav"]

    def test_drops_equals_form(self):
        assert _strip_platform_args(
            ["--platform=tpu", "serve", "a.wav"]) == ["serve", "a.wav"]

    def test_keeps_positional_named_like_platform(self):
        # a file literally named "cpu" must survive the re-exec
        assert _strip_platform_args(
            ["--platform", "cpu", "serve", "cpu"]) == ["serve", "cpu"]

    def test_mixed_positions(self):
        assert _strip_platform_args(
            ["serve", "--platform", "cpu", "cpu", "--span", "25"]) == [
                "serve", "cpu", "--span", "25"]
