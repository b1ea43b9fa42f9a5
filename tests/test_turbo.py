"""Turbo architecture track: model contract, subpixel packing, distillation.

The turbo family is a TPU-specific extension (no reference counterpart — see
``models/turbo.py``): these tests lock its output contract to the depth4 family
(4-scale sigmoid*4 float32 pyramid), the exactness of the generic space/depth
repacking, and that distillation against a depth4 teacher actually converges.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_depth_estimation_tpu.models import (
    DispNet,
    DispNetVariant,
    TurboDepthNet,
    TurboVariant,
)
from tf_depth_estimation_tpu.ops.phase import (
    depth_to_space,
    depth_to_space_n,
    space_to_depth,
    space_to_depth_n,
)


class TestSpaceDepthN:
    def test_round_trip(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 12, 5).astype(np.float32))
        for n in (1, 2, 4):
            packed = space_to_depth_n(x, n)
            assert packed.shape == (2, 8 // n, 12 // n, n * n * 5)
            np.testing.assert_array_equal(np.asarray(depth_to_space_n(packed, n)),
                                          np.asarray(x))

    def test_matches_fixed2(self):
        x = jnp.asarray(np.random.RandomState(1).rand(1, 6, 4, 3).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(space_to_depth_n(x, 2)),
                                      np.asarray(space_to_depth(x)))
        p = space_to_depth(x)
        np.testing.assert_array_equal(np.asarray(depth_to_space_n(p, 2)),
                                      np.asarray(depth_to_space(p)))

    def test_block_order(self):
        # out[..., (p*n+q)*C + c] == x[n*u+p, n*v+q, c]
        x = np.arange(1 * 4 * 4 * 2, dtype=np.float32).reshape(1, 4, 4, 2)
        packed = np.asarray(space_to_depth_n(jnp.asarray(x), 4))
        for p in range(4):
            for q in range(4):
                for c in range(2):
                    assert packed[0, 0, 0, (p * 4 + q) * 2 + c] == x[0, p, q, c]


class TestTurboModel:
    def _init(self, variant, H=64, W=96, B=1, dtype=jnp.float32):
        model = TurboDepthNet(variant, dtype=dtype)
        x = jnp.zeros((B, H, W, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        return model, variables, x

    def test_pyramid_contract(self):
        """Same output contract as DispNet depth4: 4 float32 scales in [0, 4]."""
        model, variables, _ = self._init(TurboVariant.base())
        x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 96, 3).astype(np.float32))
        preds = model.apply(variables, x, train=False)
        assert [tuple(p.shape) for p in preds] == [
            (2, 64, 96, 1), (2, 32, 48, 1), (2, 16, 24, 1), (2, 8, 12, 1)]
        for p in preds:
            assert p.dtype == jnp.float32
            arr = np.asarray(p)
            assert np.all(arr >= 0) and np.all(arr <= 4) and np.all(np.isfinite(arr))

    def test_full_only_matches_pyramid_head(self):
        model, variables, _ = self._init(TurboVariant.small())
        x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 96, 3).astype(np.float32))
        d1_full = model.apply(variables, x, train=False)[0]
        (d1_only,) = model.apply(variables, x, train=False, full_only=True)
        np.testing.assert_array_equal(np.asarray(d1_only), np.asarray(d1_full))

    def test_patch2_variant(self):
        v = TurboVariant("p2", patch=2, widths=(32, 64, 96, 96), fpn_width=32)
        model, variables, _ = self._init(v, H=32, W=32)
        preds = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
        assert [tuple(p.shape[1:3]) for p in preds] == [
            (32, 32), (16, 16), (8, 8), (4, 4)]

    def test_size_guard(self):
        model, variables, _ = self._init(TurboVariant.base())
        with pytest.raises(AssertionError, match="divisible"):
            model.apply(variables, jnp.zeros((1, 60, 96, 3)), train=False)

    def test_bn_stats_update(self):
        model, variables, x = self._init(TurboVariant.small())
        x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 96, 3).astype(np.float32))
        _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mut["batch_stats"])
        assert any(not np.allclose(np.asarray(b), np.asarray(a))
                   for b, a in zip(before, after))

    def test_bf16_compute_close_to_f32(self):
        v = TurboVariant.small()
        model32, variables, _ = self._init(v)
        model16 = TurboDepthNet(v, dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 96, 3).astype(np.float32))
        p32 = np.asarray(model32.apply(variables, x, train=False)[0])
        p16 = np.asarray(model16.apply(variables, x, train=False)[0], np.float32)
        assert np.mean(np.abs(p32 - p16)) < 0.05  # [0,4] output, bf16 rounding only


class TestFastTurboForward:
    """infer/fast_turbo.py is an exact rewrite of the eval module forward."""

    def _warmed(self, variant, H=64, W=96):
        model = TurboDepthNet(variant, dtype=jnp.float32)
        rng = np.random.RandomState(7)
        x0 = jnp.asarray((rng.rand(4, H, W, 3) * 255).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x0, train=False)
        # warm the BN stats: splat (init) stats would make the fold trivially
        # exact; realistic non-splat stats are what the fold exists for
        for _ in range(2):
            _, mut = model.apply(variables, x0, train=True,
                                 mutable=["batch_stats"])
            variables = {**variables, "batch_stats": mut["batch_stats"]}
        return model, variables

    @pytest.mark.parametrize("fold", ["none", "base", "all"])
    def test_matches_module_f32(self, fold):
        from tf_depth_estimation_tpu.infer.fast_turbo import fast_turbo_forward

        v = TurboVariant.small()
        model, variables = self._warmed(v)
        x = jnp.asarray(np.random.RandomState(8).rand(2, 64, 96, 3)
                        .astype(np.float32) * 255)
        ref = np.asarray(model.apply(variables, x, train=False, full_only=True)[0])
        got = np.asarray(fast_turbo_forward(variables, x, v, dtype=jnp.float32,
                                            fold=fold))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_patch2_four_stage(self):
        from tf_depth_estimation_tpu.infer.fast_turbo import fast_turbo_forward

        v = TurboVariant("p2", patch=2, widths=(32, 64, 96, 96), fpn_width=32)
        model, variables = self._warmed(v, H=32, W=48)
        x = jnp.asarray(np.random.RandomState(9).rand(1, 32, 48, 3)
                        .astype(np.float32) * 255)
        ref = np.asarray(model.apply(variables, x, train=False, full_only=True)[0])
        got = np.asarray(fast_turbo_forward(variables, x, v, dtype=jnp.float32))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_size_guard(self):
        from tf_depth_estimation_tpu.infer.fast_turbo import fast_turbo_forward

        v = TurboVariant.small()
        model, variables = self._warmed(v)
        with pytest.raises(AssertionError, match="divisible"):
            fast_turbo_forward(variables, jnp.zeros((1, 60, 96, 3)), v)

    def test_sprint_head_kernel_and_parity(self):
        """sprint = small widths + 1x1 disp heads; fast path stays exact."""
        from tf_depth_estimation_tpu.infer.fast_turbo import fast_turbo_forward

        v = TurboVariant.sprint()
        model, variables = self._warmed(v)
        k = variables["params"]["disp1"]["Conv_0"]["kernel"]
        assert k.shape[:2] == (1, 1) and k.shape[3] == 16
        x = jnp.asarray(np.random.RandomState(10).rand(2, 64, 96, 3)
                        .astype(np.float32) * 255)
        ref = np.asarray(model.apply(variables, x, train=False, full_only=True)[0])
        got = np.asarray(fast_turbo_forward(variables, x, v, dtype=jnp.float32))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
        # full pyramid contract intact (aux heads share the head kernel)
        preds = model.apply(variables, x, train=False)
        assert [tuple(p.shape[1:3]) for p in preds] == [
            (64, 96), (32, 48), (16, 24), (8, 12)]

    @pytest.mark.parametrize("preset", ["nano", "pico"])
    def test_nano_single_stem_conv_and_parity(self, preset):
        """nano = sprint minus the second stem conv (pico: + 1x1 fuse1);
        the fast path stays exact for both."""
        from tf_depth_estimation_tpu.infer.fast_turbo import fast_turbo_forward

        v = TurboVariant.by_name(preset)
        assert v.stem_convs == 1
        model, variables = self._warmed(v)
        assert "stemb" not in variables["params"]
        k = variables["params"]["fuse1"]["Conv_0"]["kernel"]
        assert k.shape[:2] == ((1, 1) if preset == "pico" else (3, 3))
        # deeper fuse convs keep the 3x3 kernel regardless of fuse1_kernel
        assert variables["params"]["fuse2"]["Conv_0"]["kernel"].shape[:2] == (3, 3)
        x = jnp.asarray(np.random.RandomState(11).rand(2, 64, 96, 3)
                        .astype(np.float32) * 255)
        ref = np.asarray(model.apply(variables, x, train=False, full_only=True)[0])
        for fold in ("none", "base", "all"):
            got = np.asarray(
                fast_turbo_forward(variables, x, v, dtype=jnp.float32, fold=fold))
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
        # full pyramid contract intact despite the missing stem conv
        preds = model.apply(variables, x, train=False)
        assert [tuple(p.shape[1:3]) for p in preds] == [
            (64, 96), (32, 48), (16, 24), (8, 12)]

    @pytest.mark.parametrize("preset", ["femto", "atto"])
    def test_femto_drops_encoder_refinement_convs_and_parity(self, preset):
        """femto = pico minus the enc*b refinement convs (atto: + 64-ch FPN);
        the fast path stays exact and the 4-scale pyramid contract is intact."""
        from tf_depth_estimation_tpu.infer.fast_turbo import fast_turbo_forward

        v = TurboVariant.by_name(preset)
        assert v.enc_convs == 1 and v.stem_convs == 1
        model, variables = self._warmed(v)
        assert "stemb" not in variables["params"]
        for i in range(2, len(v.widths) + 1):
            assert f"enc{i}" in variables["params"]
            assert f"enc{i}b" not in variables["params"]
        x = jnp.asarray(np.random.RandomState(13).rand(2, 64, 96, 3)
                        .astype(np.float32) * 255)
        ref = np.asarray(model.apply(variables, x, train=False, full_only=True)[0])
        for fold in ("none", "all"):
            got = np.asarray(
                fast_turbo_forward(variables, x, v, dtype=jnp.float32, fold=fold))
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
        preds = model.apply(variables, x, train=False)
        assert [tuple(p.shape[1:3]) for p in preds] == [
            (64, 96), (32, 48), (16, 24), (8, 12)]


class TestDistillation:
    def test_student_converges_to_teacher(self):
        from tf_depth_estimation_tpu.train.distill import (
            make_distill_eval,
            make_distill_step,
        )
        from tf_depth_estimation_tpu.train.state import adam, create_train_state
        from tf_depth_estimation_tpu.train.steps import jit_step

        H, W, B = 64, 96, 2
        teacher = DispNet(DispNetVariant.depth4())
        x0 = jnp.asarray(np.random.RandomState(0).rand(B, H, W, 3).astype(np.float32))
        t_vars = teacher.init(jax.random.PRNGKey(1), x0, train=False)

        # bn momentum 0.5 so the eval-mode running stats track this short overfit
        # run (at the production 0.99 the EMA lags ~100s of steps — irrelevant for
        # a real 5k-step distillation, dominant in a 30-step test)
        variant = dataclasses.replace(TurboVariant.small(), bn_momentum=0.5)
        student = TurboDepthNet(variant)
        state = create_train_state(student, jnp.zeros((B, H, W, 3)),
                                   tx=adam(2e-3))
        step = jit_step(make_distill_step(teacher.apply))
        evaluate = jax.jit(make_distill_eval(teacher.apply))

        first = None
        for _ in range(30):
            state, metrics = step(state, t_vars, x0)
            if first is None:
                first = float(metrics["total_loss"])
        last = float(metrics["total_loss"])
        assert np.isfinite(last)
        assert last < 0.5 * first, (first, last)

        stats = evaluate(state, t_vars, x0)
        assert np.isfinite(float(stats["mae_vs_teacher"]))
        # overfit on one batch: the student's full-res output tracks the teacher
        assert float(stats["mae_vs_teacher"]) < 0.3, dict(stats)


class TestTurboPredictor:
    def _make(self, height=64, **kw):
        from tf_depth_estimation_tpu.infer import TurboPredictor

        variant = TurboVariant.small()
        model = TurboDepthNet(variant)
        x0 = jnp.zeros((1, 64, 96, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0, train=False)
        pred = TurboPredictor(variables["params"], variables["batch_stats"],
                              variant=variant, height=height, width=96,
                              dtype=jnp.float32, **kw)
        return model, variables, pred

    def test_matches_module_forward(self):
        model, variables, pred = self._make(batch_size=2)
        frames = np.random.RandomState(0).rand(3, 64, 96, 3).astype(np.float32)
        got = pred.predict_array(frames)  # exercises the ragged pow2 tail too
        want = np.asarray(model.apply(variables, jnp.asarray(frames), train=False,
                                      full_only=True)[0][..., 0])
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_sharded_over_virtual_mesh(self):
        model, variables, pred = self._make(batch_size=8, num_devices=8)
        frames = np.random.RandomState(1).rand(8, 64, 96, 3).astype(np.float32)
        got = pred.predict_array(frames)
        want = np.asarray(model.apply(variables, jnp.asarray(frames), train=False,
                                      full_only=True)[0][..., 0])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_size_guard(self):
        with pytest.raises(ValueError, match="divisible"):
            self._make(batch_size=2, height=60)


class TestCliGuards:
    def test_by_name_rejects_unknown(self):
        with pytest.raises(ValueError, match="unknown turbo variant"):
            TurboVariant.by_name("bsae")
        with pytest.raises(ValueError, match="choose from"):
            TurboVariant.by_name("min_hw_multiple")  # attr exists but isn't a preset

    def test_by_name_presets(self):
        for name in TurboVariant.PRESETS:
            assert TurboVariant.by_name(name).name == name

    def test_distill_frames_glob_empty_raises(self, tmp_path):
        from tf_depth_estimation_tpu.train.experiments import distill_turbo

        with pytest.raises(FileNotFoundError, match="matched no files"):
            distill_turbo.main([
                "--checkpoint_dir", str(tmp_path / "ck"), "--turbo_variant", "small",
                "--image_height", "64", "--image_width", "96", "--batch_size", "1",
                "--max_steps", "1", "--dtype", "float32",
                "--frames_glob", str(tmp_path / "nothing" / "*.jpg"),
            ])

    def test_distill_frames_are_serving_range(self, tmp_path):
        """Distillation inputs are raw 0..255 (the serving distribution,
        batch_prediction.py:59-69) — NOT /255-normalized."""
        import argparse

        from tf_depth_estimation_tpu.train.experiments.distill_turbo import (
            _frame_batches,
        )

        args = argparse.Namespace(seed=0, frames_glob="", batch_size=4)
        batch = next(_frame_batches(args, 64, 96))["image"]
        assert float(jnp.max(batch)) > 2.0  # 0..255, not 0..1


class TestDistillMultiChip:
    def test_dp_distill_step_matches_single_device(self):
        """Distillation sharded over the 8-device data mesh == single-device: the
        teacher+student graphs partition across the mesh (params/teacher vars
        replicated, frames sharded) with XLA's gradient all-reduce."""
        from tf_depth_estimation_tpu.parallel import (
            batch_sharding,
            make_mesh,
            replicated_sharding,
        )
        from tf_depth_estimation_tpu.train.distill import make_distill_step
        from tf_depth_estimation_tpu.train.state import adam, create_train_state

        H, W, B = 64, 96, 8
        teacher = DispNet(DispNetVariant.depth4())
        x = jnp.asarray(np.random.RandomState(0).rand(B, H, W, 3).astype(np.float32))
        t_vars = teacher.init(jax.random.PRNGKey(1), x[:1], train=False)

        student = TurboDepthNet(TurboVariant.small())
        step = make_distill_step(teacher.apply)

        state1 = create_train_state(student, jnp.zeros((B, H, W, 3)), tx=adam(1e-3))
        _, m1 = jax.jit(step)(state1, t_vars, x)

        mesh = make_mesh(8)
        repl, data = replicated_sharding(mesh), batch_sharding(mesh)
        dp_step = jax.jit(step, in_shardings=(repl, repl, data),
                          out_shardings=(repl, repl))
        state2 = create_train_state(student, jnp.zeros((B, H, W, 3)), tx=adam(1e-3))
        _, m2 = dp_step(state2, t_vars, jax.device_put(x, data))

        np.testing.assert_allclose(float(m1["total_loss"]), float(m2["total_loss"]),
                                   rtol=2e-4)
