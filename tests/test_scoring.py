"""Scoring pipeline tests: batched scorer -> reference-format score files."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.losses import build_loss
from asvspoof2021_air_tpu.metrics import eer_from_score_file, read_score_file
from asvspoof2021_air_tpu.models import ECAPA_TDNN
from asvspoof2021_air_tpu.scoring import make_score_fn, score_to_file

D, T, ENC = 60, 100, 32


class SyntheticLabeled:
    def __init__(self, n=10, seed=0):
        g = np.random.default_rng(seed)
        self.labels = (np.arange(n) % 2).astype(np.int32)
        self.feats = [
            (g.standard_normal((1, T, D)) + 2.0 * l).astype(np.float32)
            for l in self.labels
        ]

    def __len__(self):
        return len(self.feats)

    def __getitem__(self, i):
        return self.feats[i], f"LA_D_{i:07d}", 0, int(self.labels[i])


def _setup(add_loss=None):
    model = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=D, enc_dim=ENC)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, jnp.zeros((2, T, D)), False)
    loss_mod = loss_vars = None
    if add_loss:
        name = "ang_iso" if add_loss == "ocsoftmax" else add_loss
        loss_mod = build_loss(name, enc_dim=ENC)
        loss_vars = loss_mod.init(rng, jnp.zeros((2, ENC)),
                                  jnp.zeros((2,), jnp.int32))
    return model, variables, loss_mod, loss_vars


def test_score_file_format(tmp_path):
    model, variables, _, _ = _setup()
    fn = make_score_fn(model, variables)
    ds = SyntheticLabeled()
    out = score_to_file(fn, ds, str(tmp_path / "score.txt"), labeled=True,
                        batch_size=4, feat_len=T)
    cols = read_score_file(out)
    assert len(cols["fname"]) == 10
    assert set(cols["key"]) == {"bonafide", "spoof"}
    # softmax-based file scores are +softmax[:, 0] after double negation
    assert np.all(cols["score"] >= 0) and np.all(cols["score"] <= 1)
    eer = eer_from_score_file(out)
    assert 0.0 <= eer <= 0.5


def test_scan_batches_scores_identically(tmp_path):
    """scan_batches=K groups K batches into one scanned dispatch
    (serving/stream.py); the score file must be byte-identical to the
    per-batch path, including the non-multiple tail (10 utts at
    batch_size=2 and K=3 -> one scanned group of 3, then 2 tail
    batches)."""
    model, variables, loss_mod, loss_vars = _setup("ocsoftmax")
    fn = make_score_fn(model, variables, loss_mod, loss_vars, "ocsoftmax")
    ds = SyntheticLabeled()
    base = score_to_file(fn, ds, str(tmp_path / "base.txt"), labeled=True,
                         batch_size=2, feat_len=T)
    scanned = score_to_file(fn, ds, str(tmp_path / "scan.txt"), labeled=True,
                            batch_size=2, feat_len=T, scan_batches=3)
    with open(base) as f1, open(scanned) as f2:
        assert f1.read() == f2.read()


def test_ocsoftmax_score_polarity(tmp_path):
    """Files store +cos for ocsoftmax (loss returns -cos, writer negates —
    the double negation at /root/reference/loss.py:97 +
    generate_score.py:116)."""
    model, variables, loss_mod, loss_vars = _setup("ocsoftmax")
    fn = make_score_fn(model, variables, loss_mod, loss_vars, "ocsoftmax")
    ds = SyntheticLabeled()
    out = score_to_file(fn, ds, str(tmp_path / "s.txt"), labeled=True,
                        batch_size=4, feat_len=T)
    cols = read_score_file(out)
    assert np.all(np.abs(cols["score"]) <= 1.0 + 1e-6)  # cosine range


def test_unlabeled_score_file(tmp_path):
    model, variables, _, _ = _setup()

    class UnlabeledDS(SyntheticLabeled):
        def __getitem__(self, i):
            return self.feats[i], f"LA_E_{i:07d}"

    fn = make_score_fn(model, variables)
    ds = UnlabeledDS()
    out = score_to_file(fn, ds, str(tmp_path / "u.txt"), labeled=False,
                        batch_size=4, feat_len=T)
    with open(out) as f:
        lines = [l.split() for l in f.read().splitlines()]
    assert len(lines) == 10
    assert all(len(l) == 2 for l in lines)


def test_all_eight_task_routes(tmp_path):
    """The full task router (/root/reference/generate_score.py:51-72): all 8
    task choices build the right dataset layout and produce valid score
    files — labeled with keys for 19* tasks, unlabeled for LA/DF."""
    from asvspoof2021_air_tpu.data import protocol as proto
    from asvspoof2021_air_tpu.scoring import TASKS, test_on_asvspoof2021

    g = np.random.default_rng(0)

    def write_feats(d, names):
        os.makedirs(d, exist_ok=True)
        for i, suffix in enumerate(names):
            np.save(os.path.join(d, f"{i:06d}_{suffix}.npy"),
                    g.standard_normal((1, 40, D)).astype(np.float32))

    ori = tmp_path / "ori"
    aug = tmp_path / "aug"
    la_eval = tmp_path / "la21"
    df_eval = tmp_path / "df21"
    # 19dev/19eval + the original halves of the aug tasks
    for part, pfx in (("dev", "LA_D"), ("eval", "LA_E")):
        write_feats(str(ori / part / "LFCC"),
                    [f"{pfx}_{i:07d}_-_{l}" for i, l in
                     enumerate(["bonafide", "spoof"] * 3)])
    # augmented trees: channel (and device) suffixes from the real vocabs
    ch_la = proto.LA_CHANNELS[1]
    ch_df = proto.DF_CHANNELS[1]
    dev = proto.DEVICES[0]
    write_feats(str(aug / "dev" / "LFCC"), [
        f"LA_D_{i:07d}_-_spoof_{ch_la}" for i in range(4)
    ])
    aug_pa = tmp_path / "aug_pa"
    write_feats(str(aug_pa / "dev" / "LFCC"), [
        f"LA_D_{i:07d}_-_spoof_{ch_la}_{dev}" for i in range(4)
    ])
    aug_df = tmp_path / "aug_df"
    write_feats(str(aug_df / "dev" / "LFCC"), [
        f"LA_D_{i:07d}_-_spoof_{ch_df}" for i in range(4)
    ])
    aug_dfpa = tmp_path / "aug_dfpa"
    write_feats(str(aug_dfpa / "dev" / "LFCC"), [
        f"LA_D_{i:07d}_-_spoof_{ch_df}_{dev}" for i in range(4)
    ])
    # challenge eval sets (4-field names)
    write_feats(str(la_eval / "LFCC"),
                [f"LA_E_{i:07d}" for i in range(5)])
    write_feats(str(df_eval / "LFCC"),
                [f"DF_E_{i:07d}" for i in range(5)])

    model, variables, loss_mod, loss_vars = _setup("ocsoftmax")
    aug_dirs = {"19laaugdev": str(aug), "19lapaaugdev": str(aug_pa),
                "19dfaugdev": str(aug_df), "19dfpaaugdev": str(aug_dfpa)}
    assert set(TASKS) == {"LA", "DF", "19dev", "19eval", "19laaugdev",
                          "19lapaaugdev", "19dfaugdev", "19dfpaaugdev"}
    for task in TASKS:
        paths = {"ori_features": str(ori),
                 "aug_features": aug_dirs.get(task, str(aug)),
                 "la_eval": str(la_eval), "df_eval": str(df_eval)}
        out = test_on_asvspoof2021(
            task, model, variables, paths, str(tmp_path / "scores"),
            f"sys_{task}", add_loss="ocsoftmax", loss_module=loss_mod,
            loss_vars=loss_vars, batch_size=8, feat_len=40,
        )
        lines = open(out).read().strip().splitlines()
        assert lines, task
        n_fields = 3 if "19" in task else 2
        for ln in lines:
            fields = ln.split()
            assert len(fields) == n_fields, (task, ln)
            assert np.isfinite(float(fields[1])), (task, ln)
        if "19" in task:
            assert {f.split()[2] for f in lines} <= {"bonafide", "spoof"}
        expected = {"LA": 5, "DF": 5, "19dev": 6, "19eval": 6,
                    "19laaugdev": 10, "19lapaaugdev": 10,
                    "19dfaugdev": 10, "19dfpaaugdev": 10}[task]
        assert len(lines) == expected, (task, len(lines))


def test_score_rule_consistent_with_eval_step():
    """scoring.score_rule (batch scoring, raw scoring, export) and the
    training eval step (model selection) must rank identically for every
    add-loss: equal scores for the loss-module rules, opposite sign for the
    CE fallback (the eval loop uses +softmax[:,0], the reference's file
    scorer -softmax[:,0] before the writer negates again,
    /root/reference/generate_score.py:102-119)."""
    import jax
    import jax.numpy as jnp

    from asvspoof2021_air_tpu.losses import build_loss
    from asvspoof2021_air_tpu.models import build_model
    from asvspoof2021_air_tpu.scoring import make_score_fn
    from asvspoof2021_air_tpu.train.state import create_train_state
    from asvspoof2021_air_tpu.train.steps import StepConfig, make_eval_step

    B, T, F, ENC = 4, 16, 60, 16
    g = np.random.default_rng(0)
    feats_in = jnp.asarray(g.standard_normal((B, T, F)), jnp.float32)
    batch = {"feat": feats_in,
             "label": jnp.zeros((B,), jnp.int32)}
    model = build_model("lcnn", enc_dim=ENC, nclasses=2, feat_dim=F,
                        feat_len=T)

    for add_loss in (None, "isolate", "iso_sq", "ang_iso", "p2sgrad"):
        loss_mod = build_loss(add_loss, enc_dim=ENC)
        state = create_train_state(
            jax.random.PRNGKey(3), model, feats_in,
            loss_module=loss_mod,
            example_feat=jnp.zeros((B, ENC)),
            example_labels=jnp.zeros((B,), jnp.int32),
        )
        eval_step = make_eval_step(model, loss_mod,
                                   StepConfig(add_loss=add_loss))
        _m, eval_score, _f = jax.jit(eval_step)(state, batch, None)

        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        loss_vars = ({"params": state.loss_params}
                     if state.loss_params is not None else None)
        file_score = make_score_fn(model, variables, loss_mod, loss_vars,
                                   add_loss)(feats_in)
        if add_loss is None:
            np.testing.assert_allclose(np.asarray(file_score),
                                       -np.asarray(eval_score),
                                       rtol=1e-5, atol=1e-6)
        else:
            np.testing.assert_allclose(np.asarray(file_score),
                                       np.asarray(eval_score),
                                       rtol=1e-5, atol=1e-6)


def test_data_mesh_sharded_scoring_matches_single_device(tmp_path):
    """scoring.py advertises feats 'sharded over the data mesh'; prove the
    claim: scores produced with batches device_put onto an 8-device data
    mesh must match the single-device scores (same jitted computation,
    GSPMD-partitioned — partitioning may reorder float reductions, so
    equality is to float32 round-off, not bit-for-bit), including the
    padded final batch."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    model, variables, loss_mod, loss_vars = _setup("ocsoftmax")
    fn = make_score_fn(model, variables, loss_mod, loss_vars, "ang_iso")
    ds = SyntheticLabeled(n=19)  # not a multiple of batch: valid-mask path

    single = score_to_file(fn, ds, str(tmp_path / "single.txt"),
                           labeled=True, batch_size=8, feat_len=T)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    data_sharding = NamedSharding(mesh, P("data"))
    sharded = score_to_file(
        fn, ds, str(tmp_path / "sharded.txt"), labeled=True, batch_size=8,
        feat_len=T, shard=lambda feats: jax.device_put(feats, data_sharding))

    a, b = read_score_file(single), read_score_file(sharded)
    assert list(a["fname"]) == list(b["fname"])
    np.testing.assert_allclose(a["score"], b["score"], rtol=3e-5, atol=3e-6)
