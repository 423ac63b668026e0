"""POSIX tar (ustar + pax) archive walk and WebDataset grouping.

Large multimodal training corpora ship as tar shards — the
WebDataset convention (all files sharing a basename up to the first
dot form one sample) is the de-facto layout for image/audio-text
pairs.  This is a from-scratch walk of the public POSIX.1-1988 ustar
layout plus the POSIX.1-2001 pax extensions: 512-byte octal-field
headers with the space-normalized checksum VALIDATED on every entry,
``x``/``g`` pax extended headers (``len key=value\\n`` records, path
and size overrides), GNU ``L`` long-name entries, and the
two-zero-block terminator.

Integer discipline throughout (octal field parsing, checksum sums,
block arithmetic); malformed input raises ``TarFormatError`` — the
binary-container contract shared with mp4/mkv/warc, proven by the
mutation battery.  Compression of the shard itself (``.tar.gz``) is
``warccodec.gunzip_members``'s layer, composed in the tests.
"""

from __future__ import annotations

from .errors import DBPSInvalidInputError


class TarFormatError(DBPSInvalidInputError):
    """Raised for malformed or out-of-subset tar bytes."""


_BLOCK = 512

#: hostile-input guard on a single member's stated size
MAX_MEMBER_BYTES = 1 << 30


def _octal(field: bytes, what: str) -> int:
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return 0
    if s[0:1] == b"\x80" or field[0:1] == b"\x80":
        # GNU base-256 extension: big-endian binary with 0x80 marker
        v = 0
        for b in field[1:]:
            v = (v << 8) | b
        return v
    try:
        return int(s, 8)
    except ValueError:
        raise TarFormatError(f"non-octal {what} field {field[:12]!r}")


def _checksum(header: bytes) -> int:
    """Header sum with the chksum field (148..155) read as spaces."""
    return (
        sum(header[:148]) + 8 * 0x20 + sum(header[156:_BLOCK])
    )


def _parse_pax(data: bytes) -> dict:
    """pax extended header body: repeated '<len> <key>=<value>\\n'."""
    out: dict = {}
    pos = 0
    while pos < len(data):
        sp = data.find(b" ", pos)
        if sp == -1:
            raise TarFormatError("pax record missing length delimiter")
        try:
            rec_len = int(data[pos:sp])
        except ValueError:
            raise TarFormatError(
                f"non-numeric pax record length {data[pos:sp][:8]!r}"
            )
        if rec_len <= 0 or pos + rec_len > len(data):
            raise TarFormatError("pax record length overruns the block")
        rec = data[sp + 1 : pos + rec_len]
        if not rec.endswith(b"\n"):
            raise TarFormatError("pax record missing newline")
        key, _, value = rec[:-1].partition(b"=")
        out[key.decode("utf-8", "replace")] = value.decode(
            "utf-8", "replace"
        )
        pos += rec_len
    return out


def parse_tar(data: bytes) -> list:
    """Walk every entry; returns dicts with name/size/mtime/typeflag/
    data.  Checksums are validated; pax path/size and GNU long names
    are applied to the following entry."""
    if len(data) % _BLOCK:
        raise TarFormatError(
            f"length {len(data)} is not a multiple of {_BLOCK}"
        )
    entries = []
    pos = 0
    pending_pax: dict = {}
    global_pax: dict = {}
    pending_longname = None
    zero_blocks = 0
    while pos < len(data):
        header = data[pos : pos + _BLOCK]
        if header == bytes(_BLOCK):
            zero_blocks += 1
            pos += _BLOCK
            if zero_blocks == 2:
                if data[pos:].strip(b"\x00"):
                    raise TarFormatError(
                        "data after the two-zero-block terminator"
                    )
                return entries
            continue
        if zero_blocks:
            raise TarFormatError("lone zero block inside the archive")
        magic = header[257:263]
        if magic not in (b"ustar\x00", b"ustar "):
            raise TarFormatError(f"bad ustar magic {magic!r}")
        stated = _octal(header[148:156], "checksum")
        if stated != _checksum(header):
            raise TarFormatError(
                f"checksum mismatch at offset {pos}: stated {stated}, "
                f"computed {_checksum(header)}"
            )
        size = _octal(header[124:136], "size")
        if size < 0 or size > MAX_MEMBER_BYTES:
            raise TarFormatError(f"member size {size} over the guard")
        typeflag = header[156:157].decode("ascii", "replace")
        nblocks = (size + _BLOCK - 1) // _BLOCK
        body_end = pos + _BLOCK + nblocks * _BLOCK
        if body_end > len(data):
            raise TarFormatError("member data overruns the archive")
        body = data[pos + _BLOCK : pos + _BLOCK + size]
        pos = body_end

        if typeflag == "x":
            pending_pax = _parse_pax(body)
            continue
        if typeflag == "g":
            global_pax.update(_parse_pax(body))
            continue
        if typeflag == "L":  # GNU long name
            pending_longname = body.rstrip(b"\x00").decode(
                "utf-8", "replace"
            )
            continue

        name = header[:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        prefix = header[345:500].split(b"\x00", 1)[0].decode(
            "utf-8", "replace"
        )
        if prefix:
            name = prefix + "/" + name
        pax = dict(global_pax)
        pax.update(pending_pax)
        pending_pax = {}
        if pending_longname is not None:
            name = pending_longname
            pending_longname = None
        if "path" in pax:
            name = pax["path"]
        if "size" in pax:
            # a pax size override reframes the body blocks themselves;
            # out of the subset (rare in practice, the encoder never
            # emits it — 8 GiB+ members)
            raise TarFormatError("pax size override is a documented seam")
        entries.append(
            {
                "name": name,
                "size": size,
                "mtime": _octal(header[136:148], "mtime"),
                "typeflag": typeflag or "0",
                "data": body,
            }
        )
    raise TarFormatError("archive missing the two-zero-block terminator")


def webdataset_groups(entries: list) -> dict:
    """WebDataset sample grouping: basename up to the FIRST dot is
    the sample key; the remainder is the field extension."""
    groups: dict = {}
    for e in entries:
        if e["typeflag"] not in ("0", "\x00", ""):
            continue  # only regular files carry sample fields
        base = e["name"].rsplit("/", 1)[-1]
        key, dot, ext = base.partition(".")
        if not dot:
            key, ext = base, ""
        sample = groups.setdefault(key, {})
        if ext in sample:
            raise TarFormatError(
                f"duplicate field {ext!r} for sample {key!r}"
            )
        sample[ext] = e["data"]
    return groups


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def _octal_field(n: int, width: int) -> bytes:
    s = ("%0*o" % (width - 1, n)).encode("ascii")
    if len(s) != width - 1:
        raise TarFormatError(f"value {n} too wide for a {width}-byte field")
    return s + b"\x00"


def encode_tar(members: list, *, mtime: int = 0) -> bytes:
    """(name, bytes) pairs -> ustar archive; names over 100 bytes go
    through a pax 'x' path record (the POSIX way)."""
    out = bytearray()
    for name, blob in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            pax_rec = b"path=" + nb + b"\n"
            # record length counts its own decimal digits: fixed point
            # of ln = digits(ln) + 1 + len(rec)
            ln = len(pax_rec) + 2
            while True:
                total = len(str(ln)) + 1 + len(pax_rec)
                if total == ln:
                    break
                ln = total
            body = str(ln).encode() + b" " + pax_rec
            out += _header(b"././@PaxHeader", len(body), b"x", mtime)
            out += _padded(body)
            out += _header(nb[:100], len(blob), b"0", mtime)
        else:
            out += _header(nb, len(blob), b"0", mtime)
        out += _padded(bytes(blob))
    out += bytes(2 * _BLOCK)
    return bytes(out)


def _padded(body: bytes) -> bytes:
    pad = (-len(body)) % _BLOCK
    return body + bytes(pad)


def _header(name: bytes, size: int, typeflag: bytes, mtime: int) -> bytes:
    h = bytearray(_BLOCK)
    h[0 : len(name)] = name
    h[100:108] = _octal_field(0o644, 8)
    h[108:116] = _octal_field(0, 8)
    h[116:124] = _octal_field(0, 8)
    h[124:136] = _octal_field(size, 12)
    h[136:148] = _octal_field(mtime, 12)
    h[148:156] = b" " * 8
    h[156:157] = typeflag
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:155] = ("%06o" % chk).encode("ascii") + b"\x00"
    h[155:156] = b" "
    return bytes(h)
