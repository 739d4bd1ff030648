"""Encrypted topology-graph artifact (the reference's only "plan
artifact").

The reference extracts the topology DAG at build time, serializes the
adjacency list as JSON and writes ``[12-byte random IV][AES-256-GCM
ciphertext + 16-byte tag]`` (TopologyGraphGenerator.java:21-46); at
startup the enclave decrypts it fail-closed — a tampered or missing
artifact aborts rather than disabling route checks — and builds
forward + reverse indexes with case-insensitive lookups
(EncryptedTopologyProvider.java:37-142).

Spark-first equivalent: the artifact gates :func:`~..functions.
security.validate_routes` — the decrypted adjacency list becomes the
tiny broadcast edges DataFrame.  The graph itself is driver-side
metadata (a topology has dozens of edges, not billions), so this is
plain Python + ``cryptography``; only the edges relation enters the
distributed plan.
"""

from __future__ import annotations

import json
import os

__all__ = [
    "write_topology_graph",
    "load_topology_graph",
    "topology_edges_df",
    "TopologyGraph",
]

_IV_LEN = 12


def _graph_json(adjacency: dict[str, list[str]]) -> str:
    """Reference wire JSON: ``{"adjacencyList":{src: [dests]}}`` with
    sorted source keys and sorted destination lists (deterministic
    across builds, TopologyGraphGenerator.buildJson)."""
    canon = {src: sorted(adjacency[src]) for src in sorted(adjacency)}
    return json.dumps({"adjacencyList": canon}, separators=(",", ":"))


def write_topology_graph(adjacency: dict[str, list[str]], path: str, key: bytes) -> None:
    """Build-time half: AES-256-GCM-encrypt the adjacency list to
    ``path`` in the reference's wire format (random 12-byte IV
    prepended, 16-byte tag appended by GCM)."""
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    if len(key) != 32:
        raise ValueError("topology key must be 32 bytes (AES-256)")
    iv = os.urandom(_IV_LEN)
    ct = AESGCM(key).encrypt(iv, _graph_json(adjacency).encode("utf-8"), None)
    with open(path, "wb") as f:
        f.write(iv + ct)


class TopologyGraph:
    """Decrypted topology: forward + reverse adjacency with
    case-insensitive component lookups (keys normalized to lowercase at
    load, EncryptedTopologyProvider:121-137, 152-166)."""

    def __init__(self, forward: dict[str, list[str]]):
        # normalize BOTH ends at load so edges()/downstream()/upstream()
        # and the Spark-side join all see one canonical case
        self.forward = {
            src.lower(): [dst.lower() for dst in dsts] for src, dsts in forward.items()
        }
        reverse: dict[str, list[str]] = {}
        for src, dsts in self.forward.items():
            for dst in dsts:
                reverse.setdefault(dst, []).append(src)
        self.reverse = reverse

    def downstream(self, component: str) -> list[str]:
        return self.forward.get(component.lower(), [])

    def upstream(self, component: str) -> list[str]:
        return self.reverse.get(component.lower(), [])

    def edges(self) -> list[tuple[str, str]]:
        return [(src, dst) for src, dsts in sorted(self.forward.items()) for dst in dsts]


def load_topology_graph(path: str, key: bytes) -> TopologyGraph:
    """Runtime half: decrypt + authenticate the artifact.  FAIL-CLOSED:
    a missing file, truncated wire format, bad tag (tampering), or
    malformed JSON raises — route validation must never silently run
    without its graph (EncryptedTopologyProvider:76-84)."""
    from cryptography.exceptions import InvalidTag
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found; run write_topology_graph at build time "
            "(route validation cannot run without its graph)"
        )
    blob = open(path, "rb").read()
    if len(blob) < _IV_LEN:
        raise ValueError(f"{path} too short to contain a valid IV")
    try:
        plain = AESGCM(key).decrypt(blob[:_IV_LEN], blob[_IV_LEN:], None)
    except InvalidTag as ex:
        raise ValueError(
            f"{path}: AES-GCM authentication failed — artifact tampered or wrong key"
        ) from ex
    root = json.loads(plain.decode("utf-8"))
    adj = root.get("adjacencyList")
    if not isinstance(adj, dict):
        raise ValueError(f"{path}: decrypted JSON missing 'adjacencyList'")
    return TopologyGraph({str(k): [str(d) for d in v] for k, v in adj.items()})


def topology_edges_df(spark, path: str, key: bytes):
    """The decrypted graph as the ``(src, dst)`` edges DataFrame that
    :func:`~..functions.security.validate_routes` broadcasts."""
    graph = load_topology_graph(path, key)
    return spark.createDataFrame(graph.edges(), "src string, dst string")
