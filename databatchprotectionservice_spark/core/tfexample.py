"""tf.train.Example on the from-scratch miniproto runtime.

The payload format inside TFRecord training shards is the public
``tensorflow/core/example/example.proto`` / ``feature.proto`` family:

    message BytesList { repeated bytes value = 1; }
    message FloatList { repeated float value = 1; }
    message Int64List { repeated int64 value = 1; }
    message Feature  { oneof kind { BytesList bytes_list = 1;
                                    FloatList float_list = 2;
                                    Int64List int64_list = 3; } }
    message Features { map<string, Feature> feature = 1; }
    message Example  { Features features = 1; }

The descriptors are built programmatically on the vendored miniproto
runtime (``vendor/miniproto`` — the same from-scratch protobuf wire
implementation that backs the TWS state-server client), with the map
field modeled as its wire-identical expansion: a repeated
``FeatureEntry { string key = 1; Feature value = 2; }``.  Encoding
emits repeated scalars unpacked (spec-legal; every conformant parser,
including this one, accepts packed AND unpacked on read).

``make_example`` / ``parse_example`` give the dict view a pipeline
wants: bytes values stay ``bytes``, int64 lists stay ``int``, float
lists are float32-quantized by the wire format (exactness holds for
values representable in float32 — asserted by callers that need it).
"""

from __future__ import annotations

from ..vendor.miniproto.google.protobuf._mini import (
    Descriptor,
    FieldDescriptor,
    OneofDescriptor,
    make_message_class,
)
from .errors import DBPSInvalidInputError

_F = FieldDescriptor


class TfExampleError(DBPSInvalidInputError):
    """Malformed or out-of-model tf.train.Example payload."""


def _message(name: str, fields: list, oneofs: list = ()) -> Descriptor:
    d = Descriptor(name, f"tensorflow.{name}")
    for o in oneofs:
        d.oneofs.append(OneofDescriptor(o))
    for fd in fields:
        d.add_field(fd)
    make_message_class(d)
    return d


def _field(name, number, ftype, *, repeated=False, msg=None, oneof=None):
    fd = _F(
        name,
        number,
        ftype,
        _F.LABEL_REPEATED if repeated else _F.LABEL_OPTIONAL,
        oneof_index=oneof,
    )
    fd.message_type = msg
    return fd


BYTES_LIST = _message(
    "BytesList", [_field("value", 1, _F.TYPE_BYTES, repeated=True)]
)
FLOAT_LIST = _message(
    "FloatList", [_field("value", 1, _F.TYPE_FLOAT, repeated=True)]
)
INT64_LIST = _message(
    "Int64List", [_field("value", 1, _F.TYPE_INT64, repeated=True)]
)
FEATURE = _message(
    "Feature",
    [
        _field("bytes_list", 1, _F.TYPE_MESSAGE, msg=BYTES_LIST, oneof=0),
        _field("float_list", 2, _F.TYPE_MESSAGE, msg=FLOAT_LIST, oneof=0),
        _field("int64_list", 3, _F.TYPE_MESSAGE, msg=INT64_LIST, oneof=0),
    ],
    oneofs=["kind"],
)
FEATURE_ENTRY = _message(
    "FeatureEntry",  # the map<string, Feature> expansion
    [
        _field("key", 1, _F.TYPE_STRING),
        _field("value", 2, _F.TYPE_MESSAGE, msg=FEATURE),
    ],
)
FEATURES = _message(
    "Features",
    [_field("feature", 1, _F.TYPE_MESSAGE, msg=FEATURE_ENTRY, repeated=True)],
)
EXAMPLE = _message(
    "Example", [_field("features", 1, _F.TYPE_MESSAGE, msg=FEATURES)]
)

_Example = EXAMPLE._concrete_class
_Features = FEATURES._concrete_class
_Entry = FEATURE_ENTRY._concrete_class
_Feature = FEATURE._concrete_class
_Bytes = BYTES_LIST._concrete_class
_Float = FLOAT_LIST._concrete_class
_Int64 = INT64_LIST._concrete_class


def make_example(features: dict) -> bytes:
    """dict -> serialized Example.  Value typing: list[bytes] ->
    bytes_list, list[int] -> int64_list, list[float] -> float_list
    (map entries sorted by key for deterministic bytes)."""
    entries = []
    for key in sorted(features):
        vals = features[key]
        if not isinstance(vals, list) or not vals:
            raise TfExampleError(
                f"feature {key!r} must be a non-empty list"
            )
        if all(isinstance(v, (bytes, bytearray)) for v in vals):
            feat = _Feature(bytes_list=_Bytes(value=[bytes(v) for v in vals]))
        elif all(
            isinstance(v, int) and not isinstance(v, bool) for v in vals
        ):
            feat = _Feature(int64_list=_Int64(value=list(vals)))
        elif all(isinstance(v, float) for v in vals):
            feat = _Feature(float_list=_Float(value=list(vals)))
        else:
            raise TfExampleError(
                f"feature {key!r} mixes or misses supported types"
            )
        entries.append(_Entry(key=key, value=feat))
    return _Example(
        features=_Features(feature=entries)
    ).SerializeToString()


def parse_example(data: bytes) -> dict:
    """serialized Example -> {key: list}; the oneof arm decides the
    element type.  Duplicate map keys follow proto map semantics
    (last entry wins)."""
    ex = _Example()
    try:
        ex.ParseFromString(bytes(data))
    except DBPSInvalidInputError:
        raise
    except Exception as e:  # miniproto wire errors
        raise TfExampleError(f"bad Example wire data: {e}") from None
    out = {}
    for entry in ex.features.feature:
        feat = entry.value
        kind = feat.WhichOneof("kind")
        if kind == "bytes_list":
            out[entry.key] = list(feat.bytes_list.value)
        elif kind == "int64_list":
            out[entry.key] = list(feat.int64_list.value)
        elif kind == "float_list":
            out[entry.key] = list(feat.float_list.value)
        elif kind is None:
            out[entry.key] = []
        else:  # pragma: no cover — the oneof has three arms
            raise TfExampleError(f"unknown feature kind {kind!r}")
    return out
