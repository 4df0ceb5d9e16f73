"""MP3 frame-header parsing: fixtures are hand-assembled CBR Layer-III
frame sequences (build_mp3), so rate/bitrate/frame-count/duration all
have known true values. Same disclosed contract as the MP4/WebM
parsers: structural metadata real, sample decode needs a codec."""

from hypothesis import given, settings
from hypothesis import strategies as st

from uckg_spark.operators.multimodal import (
    _decode_audio,
    build_mp3,
    parse_mp3,
)


@settings(max_examples=40, deadline=None)
@given(nf=st.integers(2, 500), br=st.integers(1, 14), sr=st.integers(0, 2))
def test_build_parse_mp3_property(nf, br, sr):
    got = parse_mp3(build_mp3(n_frames=nf, bitrate_idx=br,
                              samplerate_idx=sr))
    assert got["n_frames"] == nf
    assert got["duration_s"] == nf * 1152 / got["rate"]


@settings(max_examples=40, deadline=None)
@given(payload=st.binary(max_size=256))
def test_parse_mp3_never_raises_on_garbage(payload):
    parse_mp3(payload)
    parse_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x05" + payload)
    parse_mp3(b"\xff\xfb\x90\x00" + payload)


def test_mp3_cbr_fields_exact():
    got = parse_mp3(build_mp3(n_frames=38))  # ~1 s at 44100
    assert got == {"rate": 44100, "bitrate_kbps": 128, "n_frames": 38,
                   "duration_s": 38 * 1152 / 44100, "channels": 2}


def test_mp3_other_rates_and_bitrates():
    # 320 kbps @ 32000 Hz: frame length 144*320000//32000 = 1440
    got = parse_mp3(build_mp3(n_frames=5, bitrate_idx=14,
                              samplerate_idx=2))
    assert got["bitrate_kbps"] == 320 and got["rate"] == 32000
    assert got["n_frames"] == 5


def test_mp3_rejects_noise_and_lone_sync():
    assert parse_mp3(b"just some text bytes, no sync") is None
    assert parse_mp3(b"") is None
    # one valid header then garbage: a lone frame is noise, not audio
    one = build_mp3(n_frames=1) + b"\x00" * 64
    assert parse_mp3(one) is None
    # WAV payloads must not be claimed by the MP3 path
    assert parse_mp3(b"RIFF\x00\x00\x00\x00WAVEfmt ") is None


def test_mp3_id3_skip():
    raw = build_mp3(n_frames=3)
    assert raw[:3] == b"ID3"
    # stripping the tag parses identically — sync-walk, not offset luck
    assert parse_mp3(raw[20:]) == parse_mp3(raw)


def test_decode_audio_uses_mp3_metadata():
    feat = _decode_audio(build_mp3(n_frames=38))
    assert feat == [44100 / 96000.0, (38 * 1152 / 44100) / 60.0,
                    128 / 320.0, 0.5]
    fallback = _decode_audio(b"\x01\x02\x03opaque")
    assert len(fallback) == 4 and fallback[3] != 0.5
