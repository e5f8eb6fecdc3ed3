import numpy as np
import jax
import jax.numpy as jnp

from tpu3d.matching import (
    match_descriptors,
    kmeans,
    vector_quantize,
    tfidf_vectors,
    topk_similar,
    build_view_graph,
    bfs_pair_order,
    TrackStore,
)


def unit(rng, n, d=128):
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_mnn_identity(rng):
    d = unit(rng, 256)
    perm = rng.permutation(256)
    d1 = d[perm] + rng.normal(0, 0.01, d.shape).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    v = jnp.ones(256)
    res = match_descriptors(jnp.asarray(d), jnp.asarray(d1), v, v)
    valid = np.asarray(res.valid)
    assert valid.sum() > 250
    inv = np.argsort(perm)
    np.testing.assert_array_equal(np.asarray(res.idx1)[valid], inv[np.asarray(res.idx0)[valid]])


def test_mnn_respects_masks(rng):
    d = unit(rng, 64)
    v0 = jnp.asarray(np.concatenate([np.ones(32), np.zeros(32)]).astype(np.float32))
    res = match_descriptors(jnp.asarray(d), jnp.asarray(d), v0, v0)
    valid = np.asarray(res.valid)
    assert not valid[32:].any()
    assert valid[:32].all()
    np.testing.assert_array_equal(np.asarray(res.idx1)[:32], np.arange(32))


def test_kmeans_clusters(rng):
    centers = rng.normal(0, 5, (4, 16)).astype(np.float32)
    pts = np.concatenate([c + rng.normal(0, 0.1, (50, 16)) for c in centers]).astype(np.float32)
    cb = kmeans(jax.random.PRNGKey(0), jnp.asarray(pts), 4, iters=20)
    w = np.asarray(vector_quantize(jnp.asarray(pts), cb))
    # Each ground-truth cluster maps to exactly one codeword.
    for g in range(4):
        assert len(np.unique(w[g * 50 : (g + 1) * 50])) == 1
    assert len(np.unique(w[::50])) == 4


def test_tfidf_and_retrieval(rng):
    # Three "images": 0 and 1 share words, 2 is distinct.
    words = jnp.asarray(
        np.stack([
            np.array([0, 0, 1, 1, 2, 2]),
            np.array([0, 1, 1, 2, 2, 2]),
            np.array([5, 5, 6, 6, 7, 7]),
        ]).astype(np.int32)
    )
    valid = jnp.ones((3, 6))
    tv = tfidf_vectors(words, valid, k=8)
    idx, sim = topk_similar(tv, top_k=2)
    idx = np.asarray(idx)
    sim = np.asarray(sim)
    assert idx[0, 0] == 1 and idx[1, 0] == 0
    assert sim[0, 0] > 0.9
    assert sim[2, 0] < 0.1


def test_view_graph_and_bfs():
    idx = np.array([[1, 2], [0, 2], [0, 1], [1, 0]])
    sim = np.array([[0.9, 0.8], [0.9, 0.2], [0.8, 0.2], [0.1, 0.05]])
    adj = build_view_graph(idx, sim, threshold=0.75, min_neighbors=0)
    assert set(adj[0]) == {1, 2}
    assert adj[3] == []
    # min_neighbors keeps the top edges even below threshold
    adj2 = build_view_graph(idx, sim, threshold=0.75, min_neighbors=1)
    assert 1 in adj2[3]
    pairs = bfs_pair_order(adj)
    assert len(pairs) == 2  # spanning tree over {0,1,2}
    covered = {p[1] for p in pairs} | {pairs[0][0]}
    assert covered == {0, 1, 2}


def test_track_store_union():
    ts = TrackStore(num_images=3, kpts_per_image=10, capacity=100)
    # pair (0,1): matches (0<->0, 1<->1)
    t = ts.union_pair(0, 1, np.array([0, 1]), np.array([0, 1]))
    np.testing.assert_array_equal(t, [0, 1])
    # pair (1,2): keypoint 1/0 already tracked -> propagates; 1/5 new
    t = ts.union_pair(1, 2, np.array([0, 5]), np.array([3, 4]))
    assert t[0] == 0
    assert t[1] == 2
    # overlap fraction for a pair touching tracked keypoints
    assert ts.overlap_fraction(1, 2, np.array([0, 5]), np.array([3, 4])) == 1.0
    # merging: img0 kp2 (new track) then union with existing track 0
    t = ts.union_pair(0, 2, np.array([2]), np.array([9]))
    new_id = t[0]
    t2 = ts.union_pair(1, 0, np.array([0]), np.array([2]))  # track 0 meets new_id
    assert t2[0] == min(0, new_id)
    assert ts.resolve(np.array([new_id]))[0] == 0
