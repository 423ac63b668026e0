"""Transaction log (core/txnlog.py).

Replay semantics (re-add replaces, remove deletes, errors on unknown
removes and same-commit conflicts), genesis-vs-checkpoint replay
equivalence through the Avro OCF checkpoint, stats pruning with the
unknown-stays-candidate rule, and a JSON mutation battery.
"""

import random

import pytest

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.txnlog import (
    Snapshot,
    TxnLogError,
    checkpoint_bytes,
    decode_commit,
    encode_commit,
    prune,
    replay,
)


def _add(path, n, mn, mx):
    return {
        "add": {
            "path": path,
            "size": n * 100,
            "num_records": n,
            "stats": {
                "minValues": {"doc_id": mn},
                "maxValues": {"doc_id": mx},
            },
        }
    }


_META = {"metaData": {"id": "t1", "schemaString": "doc_id bigint"}}


def _log():
    return [
        encode_commit([_META, _add("f0", 10, 0, 9), _add("f1", 10, 10, 19)]),
        encode_commit([_add("f2", 5, 20, 24)]),
        encode_commit([{"remove": {"path": "f1"}}]),
        encode_commit([_add("f0", 12, 0, 11)]),  # re-add replaces
        encode_commit([{"commitInfo": {"op": "OPTIMIZE"}},
                       _add("f3", 7, 25, 31)]),
    ]


def test_replay_semantics():
    snap = replay(_log())
    assert snap.version == 4
    assert sorted(snap.files) == ["f0", "f2", "f3"]
    assert snap.files["f0"]["num_records"] == 12  # replaced
    assert snap.num_records == 24
    assert snap.metadata["id"] == "t1"


def test_checkpoint_equivalence():
    commits = _log()
    mid = replay(commits[:3])
    cp = checkpoint_bytes(mid)
    resumed = replay(commits[3:], checkpoint=cp, checkpoint_version=2)
    genesis = replay(commits)
    assert resumed.version == genesis.version
    assert resumed.files == genesis.files
    assert resumed.metadata == genesis.metadata


def test_errors():
    with pytest.raises(TxnLogError, match="unknown"):
        replay([encode_commit([_META, {"remove": {"path": "ghost"}}])])
    with pytest.raises(TxnLogError, match="duplicate"):
        replay([encode_commit([_META, _add("a", 1, 0, 0),
                               _add("a", 1, 0, 0)])])
    with pytest.raises(TxnLogError, match="add\\+remove"):
        replay([encode_commit([_META, _add("a", 1, 0, 0),
                               {"remove": {"path": "a"}}])])
    with pytest.raises(TxnLogError, match="metaData"):
        replay([encode_commit([_add("a", 1, 0, 0)])])
    with pytest.raises(TxnLogError, match="empty"):
        encode_commit([])
    with pytest.raises(TxnLogError, match="missing"):
        decode_commit(b'{"add": {"path": "p"}}\n')


def test_prune():
    snap = replay(_log())
    assert prune(snap, "doc_id", 0, 5) == ["f0"]
    assert prune(snap, "doc_id", 22, 27) == ["f2", "f3"]
    assert prune(snap, "doc_id", 100, 200) == []
    # a file without stats for the column must stay a candidate
    snap.files["f9"] = {
        "path": "f9", "size": 1, "num_records": 1, "stats": {},
    }
    assert "f9" in prune(snap, "doc_id", 100, 200)


def test_mutation_battery():
    rng = random.Random(97)
    wire = encode_commit(
        [_META, _add("part-00000", 100, 0, 99),
         {"commitInfo": {"engine": "x"}}]
    )
    for _ in range(2000):
        b = bytearray(wire)
        for _ in range(rng.randint(1, 4)):
            op = rng.randrange(3)
            if op == 0 and b:
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            elif op == 1 and len(b) > 1:
                del b[rng.randrange(len(b) - 1):]
            else:
                b.insert(rng.randrange(len(b) + 1), rng.randrange(256))
        try:
            decode_commit(bytes(b))
        except DBPSInvalidInputError:
            continue
        except (KeyError, TypeError, AttributeError,
                UnicodeDecodeError) as e:
            pytest.fail(f"non-domain error escaped: {type(e).__name__} {e}")
