"""ConfigReader schema/mode-detection parity tests (ConfigReader.cpp,
main.cpp:34-52)."""

import pytest

from imageencoder_tpu.utils.config import ConfigReader


def load(tmp_path, text):
    p = tmp_path / "t.conf"
    p.write_text(text)
    c = ConfigReader()
    assert c.read(str(p)), c.error
    return c


IMAGE = """rawfile=a.raw
encfile=a.enc
decfile=a_dec.raw
rle=1
quantfile=m.txt
width=64
height=64
logfile=a.log
"""


def test_image_schema(tmp_path):
    c = load(tmp_path, IMAGE)
    assert c.detect_mode() == "image"


def test_video_encoder_schema(tmp_path):
    c = load(tmp_path, IMAGE.replace("decfile=a_dec.raw\n", "")
             + "gop=4\nmerange=16\n")
    assert c.detect_mode() == "video-encode"


def test_video_decoder_schema(tmp_path):
    c = load(tmp_path, "encfile=a.enc\ndecfile=a.raw\nmotioncompensation=1\n")
    assert c.detect_mode() == "video-decode"


def test_missing_key_invalid(tmp_path):
    c = load(tmp_path, IMAGE.replace("width=64\n", ""))
    assert c.detect_mode() == "invalid"


def test_duplicate_key_rejected(tmp_path):
    p = tmp_path / "t.conf"
    p.write_text("width=64\nwidth=64\n")
    c = ConfigReader()
    assert not c.read(str(p))
    assert "more than once" in c.error


def test_no_equals_rejected(tmp_path):
    p = tmp_path / "t.conf"
    p.write_text("width 64\n")
    c = ConfigReader()
    assert not c.read(str(p))


def test_reference_fixture_confs_detect_image():
    for name in ("ex0", "ex1", "ex6"):
        c = ConfigReader()
        assert c.read(f"/root/reference/bin/{name}.conf")
        assert c.detect_mode() == "image", name
