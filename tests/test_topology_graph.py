"""Encrypted topology-graph artifact tests (reference parity:
TopologyGraphGenerator.java:21-46 / EncryptedTopologyProvider.java:37-142)."""

import os

import pytest

from confidential_storm_spark.functions.topology import (
    TopologyGraph,
    load_topology_graph,
    topology_edges_df,
    write_topology_graph,
)

KEY = bytes(range(32))
ADJ = {"spout": ["split", "seal"], "split": ["count"], "count": ["sink"]}


def test_roundtrip_and_wire_format(tmp_path):
    path = str(tmp_path / "topology.graph.enc")
    write_topology_graph(ADJ, path, KEY)
    blob = open(path, "rb").read()
    # wire format: 12-byte IV || ciphertext+16-byte tag (>= plaintext)
    assert len(blob) > 12 + 16
    g = load_topology_graph(path, KEY)
    assert g.downstream("spout") == ["seal", "split"]  # sorted at build
    assert g.downstream("SPOUT") == ["seal", "split"]  # case-insensitive
    assert g.upstream("count") == ["split"]
    assert g.upstream("sink") == ["count"]
    assert g.downstream("unknown") == []


def test_random_iv_fresh_per_build(tmp_path):
    p1, p2 = str(tmp_path / "a.enc"), str(tmp_path / "b.enc")
    write_topology_graph(ADJ, p1, KEY)
    write_topology_graph(ADJ, p2, KEY)
    assert open(p1, "rb").read() != open(p2, "rb").read()  # semantic security
    assert load_topology_graph(p1, KEY).forward == load_topology_graph(p2, KEY).forward


def test_fail_closed(tmp_path):
    path = str(tmp_path / "topology.graph.enc")
    write_topology_graph(ADJ, path, KEY)
    # tampering one ciphertext byte must fail authentication
    blob = bytearray(open(path, "rb").read())
    blob[-1] ^= 0x01
    open(path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="authentication failed"):
        load_topology_graph(path, KEY)
    # wrong key must fail
    write_topology_graph(ADJ, path, KEY)
    with pytest.raises(ValueError, match="authentication failed"):
        load_topology_graph(path, bytes(32))
    # missing file must fail (never silently skip route checks)
    with pytest.raises(FileNotFoundError):
        load_topology_graph(str(tmp_path / "absent.enc"), KEY)
    # truncated wire format
    open(path, "wb").write(b"short")
    with pytest.raises(ValueError, match="too short"):
        load_topology_graph(path, KEY)


def test_edges_df_feeds_validate_routes(spark, tmp_path):
    from confidential_storm_spark.functions.security import validate_routes

    path = str(tmp_path / "topology.graph.enc")
    write_topology_graph({"a": ["b"], "b": ["c"]}, path, KEY)
    edges = topology_edges_df(spark, path, KEY)
    assert sorted(tuple(r) for r in edges.collect()) == [("a", "b"), ("b", "c")]
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "source string, destination string"
    )
    ok = sorted(
        (r["source"], r["destination"]) for r in validate_routes(df, edges).collect()
    )
    assert ok == [("a", "b"), ("b", "c")]


def test_mixed_case_components_normalized_both_ends(spark, tmp_path):
    """ADVICE: dst was kept original-case while src was lowered, so
    mixed-case graphs rejected valid routes.  Both ends normalize now."""
    from confidential_storm_spark.functions.security import validate_routes

    g = TopologyGraph({"SpoutA": ["BoltB", "boltC"], "BOLTB": ["boltC"]})
    assert sorted(g.edges()) == [
        ("boltb", "boltc"),
        ("spouta", "boltb"),
        ("spouta", "boltc"),
    ]
    assert g.downstream("sPoUtA") == ["boltb", "boltc"]
    assert sorted(g.upstream("BoltC")) == ["boltb", "spouta"]

    path = str(tmp_path / "mixed.enc")
    write_topology_graph({"SpoutA": ["BoltB"]}, path, KEY)
    edges = topology_edges_df(spark, path, KEY)
    df = spark.createDataFrame(
        [("spouta", "boltb"), ("SPOUTA", "BoltB"), ("spouta", "nope")],
        "source string, destination string",
    )
    ok = sorted(
        (r["source"], r["destination"]) for r in validate_routes(df, edges).collect()
    )
    assert ok == [("SPOUTA", "BoltB"), ("spouta", "boltb")]
