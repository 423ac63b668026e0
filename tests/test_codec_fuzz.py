"""Cross-codec robustness battery.

A web-scale corpus WILL contain corrupt media; every decoder must either
decode or raise its own format error — never hang, never escape with an
arbitrary exception (an IndexError deep inside a mapInPandas stage kills
the whole task set with an undiagnosable traceback). Same contract the
JPEG fuzz tests pin in test_jpegcodec.py, applied to every codec.
"""

import numpy as np
import pytest

from databatchprotectionservice_spark.core.audiocodec import (
    AudioFormatError,
    decode_wav,
    decode_wav_adpcm,
    encode_wav,
    encode_wav_adpcm,
)
from databatchprotectionservice_spark.core.flaccodec import (
    FlacFormatError,
    decode_flac,
    encode_flac,
)
from databatchprotectionservice_spark.core.gifcodec import (
    GRAY_PALETTE,
    GifFormatError,
    decode_gif,
    encode_gif,
)
from databatchprotectionservice_spark.core.imagecodec import (
    ImageFormatError,
    decode_image,
    encode_bmp,
    encode_png,
    encode_png_adam7,
    encode_png_palette,
    encode_ppm,
)
from databatchprotectionservice_spark.core.videocodec import (
    VideoFormatError,
    decode_y4m,
    encode_y4m,
)


def _bases():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(6, 7, 3), dtype=np.uint8)
    return {
        "png": (encode_png(img), decode_image, ImageFormatError),
        "bmp": (encode_bmp(img), decode_image, ImageFormatError),
        "ppm": (encode_ppm(img), decode_image, ImageFormatError),
        "gif": (
            encode_gif(img[:, :, 0], GRAY_PALETTE),
            decode_gif,
            GifFormatError,
        ),
        "wav": (
            encode_wav(np.arange(-50, 50, dtype=np.int16)),
            decode_wav,
            AudioFormatError,
        ),
        "adpcm": (
            encode_wav_adpcm(np.arange(-400, 400, 2, dtype=np.int16)),
            decode_wav_adpcm,
            AudioFormatError,
        ),
        "flac": (
            encode_flac(
                ((np.arange(700) * 17 + 3) % 65536 - 32768).astype(np.int16)
            ),
            decode_flac,
            FlacFormatError,
        ),
        "png_adam7": (
            encode_png_adam7(img),
            decode_image,
            ImageFormatError,
        ),
        "png_palette": (
            encode_png_palette((img // 64) * 64),
            decode_image,
            ImageFormatError,
        ),
        "y4m": (
            encode_y4m(
                rng.randint(0, 256, size=(2, 3, 4, 4), dtype=np.uint8)
            ),
            decode_y4m,
            VideoFormatError,
        ),
    }


@pytest.mark.parametrize(
    "fmt",
    ["png", "png_adam7", "png_palette", "bmp", "ppm", "gif", "wav",
     "adpcm", "flac", "y4m"],
)
def test_mutations_decode_or_raise_domain_error(fmt):
    base, dec, err = _bases()[fmt]
    rng = np.random.RandomState(97)
    for trial in range(300):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            data[rng.randint(len(data))] = rng.randint(256)
        try:
            dec(bytes(data))
        except err:
            pass  # the domain error IS the contract


@pytest.mark.parametrize(
    "fmt",
    ["png", "png_adam7", "png_palette", "bmp", "ppm", "gif", "wav",
     "adpcm", "flac", "y4m"],
)
def test_truncations_decode_or_raise_domain_error(fmt):
    base, dec, err = _bases()[fmt]
    for cut in range(0, len(base), 3):
        try:
            dec(base[:cut])
        except err:
            pass
