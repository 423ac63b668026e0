"""refbench snappy shim <-> real snappy (pyarrow) interop.

The C++ baseline's SNAPPY scenarios are only a fair comparison if the
shim implements the exact public snappy block format. Compile the
header standalone and verify byte-for-byte interop with pyarrow's
bundled real snappy in both directions, plus self round-trips, on
payload shapes covering literals, short/long/overlapping copies, and
multi-block (>64 KiB) input. Skips when no C++ compiler is available
(the engine itself never needs one — this guards the benchmark rig).
"""

import os
import random
import shutil
import subprocess

import pytest

pa = pytest.importorskip("pyarrow")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = os.path.join(REPO, "refbench", "shims")

DRIVER_SRC = r"""
#include "snappy.h"
#include <cstdio>
#include <vector>
int main(int argc, char** argv) {
    FILE* f = fopen(argv[2], "rb");
    fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
    std::vector<char> in(n); if (n) fread(in.data(), 1, n, f); fclose(f);
    std::vector<char> out; size_t olen = 0;
    if (argv[1][0] == 'c') {
        out.resize(snappy::MaxCompressedLength(n));
        snappy::RawCompress(in.data(), n, out.data(), &olen);
    } else {
        if (!snappy::GetUncompressedLength(in.data(), n, &olen)) return 1;
        out.resize(olen);
        if (!snappy::RawUncompress(in.data(), n, out.data())) return 1;
    }
    FILE* g = fopen(argv[3], "wb");
    if (olen) fwrite(out.data(), 1, olen, g);
    fclose(g);
    return 0;
}
"""


@pytest.fixture(scope="module")
def shim_tool(tmp_path_factory):
    gxx = shutil.which("g++") or shutil.which("c++")
    if gxx is None:
        pytest.skip("no C++ compiler on this box")
    d = tmp_path_factory.mktemp("snappy_shim")
    src = d / "driver.cpp"
    src.write_text(DRIVER_SRC)
    exe = d / "driver"
    subprocess.run(
        [gxx, "-std=c++20", "-O2", f"-I{SHIM}", "-o", str(exe), str(src)],
        check=True,
        capture_output=True,
    )
    return str(exe)


def _shim(tool, mode: str, data: bytes, tmp_path) -> bytes:
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.bin"
    src.write_bytes(data)
    subprocess.run([tool, mode, str(src), str(dst)], check=True)
    return dst.read_bytes()


def _payloads():
    rng = random.Random(1234)
    text = (b"the quick brown fox jumps over the lazy dog " * 2000)[:65_000]
    yield "empty", b""
    yield "one byte", b"Q"
    yield "short repeat", b"ababab" * 4
    yield "overlap copies", b"\x01\x02" * 50_000  # offset-2 overlapping copy
    yield "text 65k", text
    yield "random 150k", bytes(rng.randrange(256) for _ in range(150_000))
    yield "low entropy 150k", bytes(rng.randrange(4) for _ in range(150_000))
    yield "multi-block mixed", text + bytes(
        rng.randrange(256) for _ in range(100_000)
    ) + text


_CASES = list(_payloads())


@pytest.mark.parametrize(
    "label,data", _CASES, ids=[label for label, _ in _CASES]
)
def test_shim_interops_with_real_snappy(shim_tool, tmp_path, label, data):
    codec = pa.Codec("snappy")
    # shim compress -> real snappy decompress
    shim_c = _shim(shim_tool, "c", data, tmp_path)
    assert (
        codec.decompress(shim_c, decompressed_size=len(data), asbytes=True)
        == data
    ), f"{label}: real snappy cannot decode shim output"
    # real snappy compress -> shim decompress
    real_c = codec.compress(data, asbytes=True)
    assert _shim(shim_tool, "d", real_c, tmp_path) == data, (
        f"{label}: shim cannot decode real snappy output"
    )
    # shim self round-trip
    assert _shim(shim_tool, "d", shim_c, tmp_path) == data, (
        f"{label}: shim self round-trip failed"
    )
