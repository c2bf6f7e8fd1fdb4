"""Semi-CRF core tests: brute-force enumeration oracle, gradient checks, and
behavioral parity against the PyTorch reference implementation (loaded at test
time from /root/reference, never copied)."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transkun_tpu.ops import semicrf


# ---------------------------------------------------------------------------
# Brute-force oracle: enumerate every valid configuration for tiny T.
# A configuration = a set of jump intervals (b<e, chainable: non-overlapping
# interiors, endpoints may coincide) + any subset of singletons at visited
# positions.  Its score matches eval_path semantics.
# ---------------------------------------------------------------------------


def enumerate_paths(T):
    """Yield (intervals, visited) for all move sequences 0 -> T-1."""

    def rec(j, intervals, visited):
        if j == T - 1:
            yield list(intervals), list(visited)
            return
        # skip move
        yield from rec(j + 1, intervals, visited + [j + 1])
        # jump moves
        for e in range(j + 1, T):
            yield from rec(e, intervals + [(j, e)], visited + [e])

    yield from rec(0, [], [0])


def config_score(intervals, singletons, score, noise):
    s = 0.0
    covered = np.ones(len(noise) + 1, bool)  # steps t->t+1 not inside intervals
    for b, e in intervals:
        s += score[e, b]
        for t in range(b, e):
            covered[t] = False
    for t in range(len(noise)):
        if covered[t]:
            s += noise[t]
    for i in singletons:
        s += score[i, i]
    return s


def brute_force(score, noise):
    """Returns (logZ, best_score, best_config) by full enumeration."""
    T = score.shape[0]
    logs = []
    best = -np.inf
    best_cfg = None
    for intervals, visited in enumerate_paths(T):
        # all subsets of singletons over visited positions
        vis = sorted(set(visited))
        for mask in range(1 << len(vis)):
            singles = [vis[k] for k in range(len(vis)) if mask >> k & 1]
            sc = config_score(intervals, singles, score, noise)
            logs.append(sc)
            if sc > best:
                best = sc
                best_cfg = sorted(intervals + [(i, i) for i in singles])
    m = max(logs)
    logz = m + math.log(sum(math.exp(v - m) for v in logs))
    return logz, best, best_cfg


@pytest.mark.parametrize("T", [2, 3, 4, 5])
@pytest.mark.quick
def test_logz_matches_bruteforce(rng, T):
    for trial in range(3):
        score = rng.normal(size=(T, T, 2)).astype(np.float32)
        noise = rng.normal(size=(T - 1, 2)).astype(np.float32)
        lz = np.asarray(semicrf.log_z(jnp.asarray(score), jnp.asarray(noise)))
        lz_slow = np.asarray(
            semicrf.log_z_slow(jnp.asarray(score), jnp.asarray(noise))
        )
        for b in range(2):
            ref, _, _ = brute_force(score[:, :, b], noise[:, b])
            assert abs(lz[b] - ref) < 5e-4, (T, trial, b)
            assert abs(lz_slow[b] - ref) < 5e-4


@pytest.mark.parametrize("T", [3, 4, 5])
def test_viterbi_matches_bruteforce(rng, T):
    for trial in range(5):
        score = rng.normal(size=(T, T, 2)).astype(np.float32) * 2
        noise = rng.normal(size=(T - 1, 2)).astype(np.float32) * 2
        crf = semicrf.NeuralSemiCRFInterval(jnp.asarray(score), jnp.asarray(noise))
        for forward in (False, True):
            paths = crf.decode(forward=forward)
            for b in range(2):
                _, best, best_cfg = brute_force(score[:, :, b], noise[:, b])
                got = config_score(
                    [(x, y) for x, y in paths[b] if x != y],
                    [x for x, y in paths[b] if x == y],
                    score[:, :, b],
                    noise[:, b],
                )
                assert abs(got - best) < 1e-4, (paths[b], best_cfg, forward)


def test_eval_path_matches_config_score(rng):
    T, N = 12, 3
    score = rng.normal(size=(T, T, N)).astype(np.float32)
    noise = rng.normal(size=(T - 1, N)).astype(np.float32)
    intervals = [[(0, 2), (4, 6), (6, 6), (7, 8)], [(1, 2), (3, 5), (11, 11)], []]
    got = np.asarray(
        semicrf.eval_path(intervals, jnp.asarray(score), jnp.asarray(noise))
    )
    for b in range(N):
        iv = [(x, y) for x, y in intervals[b] if x != y]
        sg = [x for x, y in intervals[b] if x == y]
        ref = config_score(iv, sg, score[:, :, b], noise[:, b])
        assert abs(got[b] - ref) < 1e-4


def test_logz_gradients_are_marginals(rng):
    """d logZ / d score must equal posterior marginals; check against the
    autodiff gradient of the slow path and against finite differences."""
    T, N = 8, 2
    score = jnp.asarray(rng.normal(size=(T, T, N)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(T - 1, N)).astype(np.float32))

    g_fast = jax.grad(lambda s, n: semicrf.log_z(s, n).sum(), argnums=(0, 1))(
        score, noise
    )
    g_slow = jax.grad(lambda s, n: semicrf.log_z_slow(s, n).sum(), argnums=(0, 1))(
        score, noise
    )
    tril = np.tril(np.ones((T, T), bool))[:, :, None]
    np.testing.assert_allclose(
        np.asarray(g_fast[0]) * tril, np.asarray(g_slow[0]) * tril, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(g_fast[1]), np.asarray(g_slow[1]), atol=2e-4)

    # marginals are probabilities
    lz, marg, margn = semicrf.marginals(score, noise)
    assert np.all(np.asarray(marg) >= 0)
    assert np.all(np.asarray(marg) <= 1 + 1e-5)
    assert np.all(np.asarray(margn) >= 0)

    # finite differences on a few entries
    eps = 1e-3
    for (i, j) in [(3, 1), (5, 5), (7, 0)]:
        sp = score.at[i, j, 0].add(eps)
        sm = score.at[i, j, 0].add(-eps)
        fd = (semicrf.log_z_slow(sp, noise)[0] - semicrf.log_z_slow(sm, noise)[0]) / (
            2 * eps
        )
        assert abs(float(fd) - float(g_fast[0][i, j, 0])) < 1e-2


def test_forced_start_pos(rng):
    """forcedStartPos must pin the first visited frame of the backward walk."""
    T, N = 20, 4
    score = rng.normal(size=(T, T, N)).astype(np.float32)
    noise = rng.normal(size=(T - 1, N)).astype(np.float32)
    crf = semicrf.NeuralSemiCRFInterval(jnp.asarray(score), jnp.asarray(noise))
    paths = crf.decode(forcedStartPos=[5, 0, 19, 10])
    for b, start in enumerate([5, 0, 19, 10]):
        for (x, y) in paths[b]:
            assert x >= start


def test_convergence_recovers_targets():
    """Mirror of the reference __main__ demo (ref :591-622): optimizing the
    NLL of fixed target intervals over a random score tensor must make
    decode() reproduce the targets exactly."""
    T, N = 24, 4
    key = jax.random.PRNGKey(0)
    score = jax.random.normal(key, (T, T, N))
    noise = jax.random.normal(jax.random.PRNGKey(1), (T - 1, N))
    targets = [
        [(0, 2), (4, 6), (6, 6), (7, 8)],
        [(1, 2), (3, 5), (19, 19)],
        [(0, 0), (4, 7)],
        [],
    ]
    begins, ends, mask = semicrf.pad_intervals(targets)
    begins, ends, mask = jnp.asarray(begins), jnp.asarray(ends), jnp.asarray(mask)

    @jax.jit
    def loss_fn(score, noise):
        lp = semicrf.eval_path_padded(score, noise, begins, ends, mask) - semicrf.log_z(
            score, noise
        )
        return -lp.sum()

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    lr = 0.5
    for it in range(300):
        gs, gn = grad_fn(score, noise)
        score = score - lr * gs
        noise = noise - lr * gn
    crf = semicrf.NeuralSemiCRFInterval(score, noise)
    decoded = crf.decode()
    assert [sorted(p) for p in decoded] == [sorted(t) for t in targets]


# ---------------------------------------------------------------------------
# Parity against the PyTorch reference (behavioral oracle, loaded at runtime).
# ---------------------------------------------------------------------------

REF = "/root/reference/transkun/CRF/NeuralSemiCRFInterval.py"


def _load_reference():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_semicrf", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
class TestReferenceParity:
    @pytest.fixture(scope="class")
    def ref(self):
        return _load_reference()

    def _rand(self, rng, T, N):
        score = rng.normal(size=(T, T, N)).astype(np.float32)
        noise = rng.normal(size=(T - 1, N)).astype(np.float32)
        return score, noise

    def test_logz_parity(self, ref, rng):
        import torch

        score, noise = self._rand(rng, 40, 6)
        ours = np.asarray(semicrf.log_z(jnp.asarray(score), jnp.asarray(noise)))
        theirs = ref.computeLogZ(torch.from_numpy(score), torch.from_numpy(noise))
        np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-4)

    def test_marginal_parity(self, ref, rng):
        import torch

        score, noise = self._rand(rng, 24, 4)
        lz, marg, margn = semicrf.marginals(jnp.asarray(score), jnp.asarray(noise))
        tlz, tmarg, tmargn = ref.forward_backward(
            torch.from_numpy(score), torch.from_numpy(noise)
        )
        np.testing.assert_allclose(np.asarray(lz), tlz.numpy(), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(marg), tmarg.numpy(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(margn), tmargn.numpy(), atol=1e-3)

    def test_decode_parity(self, ref, rng):
        import torch

        # config 1 of BASELINE.json: T=200, NBatch=4
        score, noise = self._rand(rng, 200, 4)
        crf = semicrf.NeuralSemiCRFInterval(jnp.asarray(score), jnp.asarray(noise))
        for forward in (False, True):
            ours = crf.decode(forward=forward)
            if forward:
                theirs = ref.viterbi(torch.from_numpy(score), torch.from_numpy(noise))
            else:
                theirs = ref.viterbiBackward(
                    torch.from_numpy(score), torch.from_numpy(noise)
                )
            assert ours == [list(map(tuple, p)) for p in theirs], f"forward={forward}"

    def test_decode_parity_forced_start(self, ref, rng):
        import torch

        score, noise = self._rand(rng, 60, 4)
        starts = [0, 10, 30, 59]
        crf = semicrf.NeuralSemiCRFInterval(jnp.asarray(score), jnp.asarray(noise))
        ours = crf.decode(forcedStartPos=starts, forward=False)
        theirs = ref.viterbiBackward(
            torch.from_numpy(score), torch.from_numpy(noise), starts
        )
        assert ours == [list(map(tuple, p)) for p in theirs]

    def test_eval_path_parity(self, ref, rng):
        import torch

        score, noise = self._rand(rng, 30, 3)
        intervals = [[(0, 2), (4, 6), (6, 6), (7, 8)], [(1, 2), (3, 5)], []]
        ours = np.asarray(
            semicrf.eval_path(intervals, jnp.asarray(score), jnp.asarray(noise))
        )
        theirs = ref.evalPath(
            intervals, torch.from_numpy(score), torch.from_numpy(noise)
        )
        np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-4)


class TestDeviceWalk:
    """walk_backward_device must reproduce the host backtrack exactly."""

    def _tables(self, rng, T, N):
        score = (rng.normal(size=(T, T, N)) * 2).astype(np.float32)
        noise = (rng.normal(size=(T - 1, N)) * 0.5).astype(np.float32)
        return semicrf.viterbi_backward_tables(
            jnp.asarray(score), jnp.asarray(noise)
        )

    def test_matches_host_walk(self, rng):
        ptr, diag = self._tables(rng, 40, 6)
        ptr_np, diag_np = np.asarray(ptr), np.asarray(diag)
        host = semicrf.backtrack_backward(ptr_np, diag_np)
        begins, ends, count, overflow = jax.jit(
            semicrf.walk_backward_device, static_argnums=3
        )(ptr, diag, jnp.zeros(6, jnp.int32), 64)
        assert not bool(np.asarray(overflow).any())
        for b in range(6):
            n = int(count[b])
            dev = list(
                zip(np.asarray(begins)[b, :n].tolist(), np.asarray(ends)[b, :n].tolist())
            )
            assert dev == host[b], b

    def test_matches_host_walk_forced_start(self, rng):
        ptr, diag = self._tables(rng, 50, 4)
        starts = [0, 7, 25, 49]
        host = semicrf.backtrack_backward(np.asarray(ptr), np.asarray(diag), starts)
        begins, ends, count, overflow = jax.jit(
            semicrf.walk_backward_device, static_argnums=3
        )(ptr, diag, jnp.asarray(starts, jnp.int32), 64)
        assert not bool(np.asarray(overflow).any())
        for b in range(4):
            n = int(count[b])
            dev = list(
                zip(np.asarray(begins)[b, :n].tolist(), np.asarray(ends)[b, :n].tolist())
            )
            assert dev == host[b], b

    def test_overflow_flag(self, rng):
        # force many singletons so tiny k_max overflows
        T, N = 30, 2
        score = np.full((T, T, N), -5.0, np.float32)
        for t in range(T):
            score[t, t] = 5.0  # every position fires a singleton
        noise = np.ones((T - 1, N), np.float32)
        ptr, diag = semicrf.viterbi_backward_tables(
            jnp.asarray(score), jnp.asarray(noise)
        )
        begins, ends, count, overflow = semicrf.walk_backward_device(
            ptr, diag, jnp.zeros(N, jnp.int32), 8
        )
        assert bool(np.asarray(overflow).all())
        assert int(np.asarray(count).max()) == 8
        host = semicrf.backtrack_backward(np.asarray(ptr), np.asarray(diag))
        # the first 8 emitted events still match the host walk prefix
        for b in range(N):
            dev = list(zip(np.asarray(begins)[b].tolist(), np.asarray(ends)[b].tolist()))
            assert dev == host[b][:8]
