"""Loss tests vs torch oracle implementations of the reference's losses."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from bathymetric_gnn_tpu.training import losses as L


def setup_data(n=50, pad=64, seed=0):
    rg = np.random.default_rng(seed)
    logits = rg.normal(size=(pad, 3)).astype(np.float32)
    labels = rg.integers(0, 3, pad).astype(np.int32)
    conf = rg.uniform(0.01, 0.99, pad).astype(np.float32)
    corr_pred = rg.normal(size=pad).astype(np.float32)
    corr_tgt = rg.normal(size=pad).astype(np.float32)
    mask = np.zeros(pad, bool)
    mask[:n] = True
    return logits, labels, conf, corr_pred, corr_tgt, mask


class TestClassificationLoss:
    def test_matches_torch_ce(self):
        logits, labels, *_, mask = setup_data()
        n = mask.sum()
        got = L.classification_loss(logits, labels, mask)
        want = TF.cross_entropy(torch.tensor(logits[:n]),
                                torch.tensor(labels[:n].astype(np.int64)))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_weighted_and_smoothed(self):
        logits, labels, *_, mask = setup_data()
        n = mask.sum()
        w = np.array([0.5, 2.0, 1.5], np.float32)
        got = L.classification_loss(logits, labels, mask, jnp.asarray(w), 0.1)
        want = TF.cross_entropy(
            torch.tensor(logits[:n]), torch.tensor(labels[:n].astype(np.int64)),
            weight=torch.tensor(w), label_smoothing=0.1,
        )
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_padding_is_ignored(self):
        logits, labels, *_, mask = setup_data()
        base = float(L.classification_loss(logits, labels, mask))
        logits2 = logits.copy()
        logits2[~mask] = 1e6  # garbage in padding
        np.testing.assert_allclose(
            float(L.classification_loss(logits2, labels, mask)), base, rtol=1e-6
        )


class TestCorrectionLoss:
    def test_matches_torch_huber(self):
        _, labels, _, pred, tgt, mask = setup_data()
        sel = mask & (labels == 2)
        got = L.correction_loss(pred, tgt, sel, delta=1.3)
        want = TF.huber_loss(torch.tensor(pred[sel]), torch.tensor(tgt[sel]),
                             delta=1.3)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_empty_mask_is_zero(self):
        _, _, _, pred, tgt, _ = setup_data()
        sel = np.zeros(len(pred), bool)
        assert float(L.correction_loss(pred, tgt, sel)) == 0.0


class TestConfidenceLoss:
    def test_matches_torch_bce(self):
        logits, labels, conf, *_, mask = setup_data()
        pred = logits.argmax(-1)
        n = mask.sum()
        got = L.confidence_calibration_loss(conf, pred, labels, mask)
        correct = (pred[:n] == labels[:n]).astype(np.float32)
        want = TF.binary_cross_entropy(torch.tensor(conf[:n]),
                                       torch.tensor(correct))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


class TestFeatureShoalLosses:
    def test_feature_preservation(self):
        pred = np.array([2, 2, 0, 1], np.int32)
        true = np.array([1, 1, 1, 1], np.int32)
        mask = np.ones(4, bool)
        got = float(L.feature_preservation_loss(pred, true, mask))
        np.testing.assert_allclose(got, 2.0 * 2 / 4)

    def test_shoal_safety_asymmetry(self):
        pred = np.array([2, 2, 2, 0], np.int32)
        true = np.array([0, 0, 1, 0], np.int32)  # two seafloor FPs
        corr = np.array([-1.0, 1.0, -5.0, 0.0], np.float32)
        mask = np.ones(4, bool)
        got = float(L.shoal_safety_loss(pred, true, corr, mask))
        # (3*1 + 1*1) / 2 FPs
        np.testing.assert_allclose(got, 2.0)

    def test_shoal_no_fp_is_zero(self):
        pred = np.zeros(4, np.int32)
        true = np.zeros(4, np.int32)
        corr = np.zeros(4, np.float32)
        assert float(L.shoal_safety_loss(pred, true, corr, np.ones(4, bool))) == 0.0


class TestCombined:
    def test_combined_weighting(self):
        logits, labels, conf, pred_c, tgt_c, mask = setup_data()
        outputs = {
            "class_logits": jnp.asarray(logits),
            "predicted_class": jnp.argmax(jnp.asarray(logits), -1),
            "confidence": jnp.asarray(conf),
            "correction": jnp.asarray(pred_c),
        }
        targets = {
            "labels": jnp.asarray(labels),
            "correction": jnp.asarray(tgt_c),
            "noise_mask": jnp.asarray(labels == 2),
        }
        d = L.combined_loss(outputs, targets, jnp.asarray(mask))
        total = (
            1.0 * d["classification"] + 0.5 * d["correction"]
            + 0.2 * d["confidence"] + 0.3 * d["feature_preservation"]
            + 0.5 * d["shoal_safety"]
        )
        np.testing.assert_allclose(float(d["total"]), float(total), rtol=1e-6)


class TestHelpers:
    def test_class_weights(self):
        w = L.compute_class_weights(np.array([750, 50, 200]))
        assert w.sum() == np.float32(3.0) or abs(w.sum() - 3.0) < 1e-5
        assert w[1] > w[2] > w[0]

    def test_correction_delta(self):
        c = np.concatenate([np.zeros(95), np.full(5, 10.0)])
        d = L.compute_correction_delta(c)
        assert d >= 1.0
        assert L.compute_correction_delta(np.array([])) == 1.0
