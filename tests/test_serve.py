"""Serving/deployment path: InferenceSession, rollout, AOT, jax.export.

The reference has no inference story (a run can only be reattached inside the
training harness, problems.py:68-83); these tests pin the new capability:
deterministic predictions, modality-subset posteriors, closed-loop rollout,
AOT executables, run-dir loading without a dataset, and the serialized
StableHLO artifact roundtrip.
"""

import json
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdyn_tpu.models.factory import setup_model
from mmdyn_tpu.problems.base import ProblemConfig, make_optimizer
from mmdyn_tpu.serve import InferenceSession, export_session, load_exported
from mmdyn_tpu.serve.session import _infer_condition_dim


def _mvae_session(use_pose=True, conditional=False, condition_dim=None,
                  latent=8, parity=False):
    cfg = ProblemConfig(problem_type="seq_modeling", model_name="cnn-mvae",
                        input_type="visuotactile", use_pose=use_pose,
                        conditional=conditional, condition_dim=condition_dim,
                        latent_size=latent, batchsize=2)
    model = setup_model(cfg.model_name, cross_modal=True, latent_size=latent,
                        use_pose=use_pose, architecture="cnn",
                        conditional=conditional, categorical_conditions=False,
                        condition_dim=condition_dim,
                        compute_dtype="float32")
    img = jnp.zeros((2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "reparam": jax.random.PRNGKey(2)}
    pose = jnp.zeros((2, 7)) if use_pose else None
    cond = jnp.zeros((2, condition_dim)) if conditional else None
    params = model.init(rngs, [img, img], pose, cond)["params"]
    return InferenceSession(cfg, params, parity=parity)


def _img(seed=0, b=2):
    return jax.random.uniform(jax.random.PRNGKey(seed), (b, 64, 64, 3))


class TestPredict:
    def test_deterministic_and_subset_posteriors(self):
        s = _mvae_session()
        v, t = _img(0), _img(1)
        out1 = s.predict(visual=v)
        out2 = s.predict(visual=v)
        for k in out1:  # dropout off + z=mu: bitwise reproducible
            np.testing.assert_array_equal(out1[k], out2[k])
        assert set(out1) == {"visual", "tactile", "pose", "mu", "logvar"}
        assert out1["visual"].shape == (2, 64, 64, 3)
        assert float(out1["visual"].min()) >= 0.0
        assert float(out1["visual"].max()) <= 1.0

        joint = s.predict(visual=v, tactile=t, pose=jnp.zeros((2, 7)))
        # more experts -> tighter posterior (PoE precision adds)
        assert float(jnp.mean(joint["logvar"])) < float(jnp.mean(out1["logvar"]))

    def test_sample_draws_differ_but_share_posterior(self):
        s = _mvae_session()
        v = _img()
        a = s.predict(visual=v, sample=True, rng=jax.random.PRNGKey(1))
        b = s.predict(visual=v, sample=True, rng=jax.random.PRNGKey(2))
        np.testing.assert_allclose(a["mu"], b["mu"], rtol=1e-6)
        assert not np.allclose(a["visual"], b["visual"])

    def test_parity_mode_keeps_dropout_live(self):
        s = _mvae_session(parity=True)
        v = _img()
        a = s.predict(visual=v, rng=jax.random.PRNGKey(1))
        b = s.predict(visual=v, rng=jax.random.PRNGKey(2))
        assert not np.allclose(a["mu"], b["mu"])

    def test_encode_matches_predict(self):
        s = _mvae_session(use_pose=False)
        v, t = _img(0), _img(1)
        mu, lv = s.encode(visual=v, tactile=t)
        out = s.predict(visual=v, tactile=t)
        np.testing.assert_allclose(mu, out["mu"], rtol=1e-6)
        np.testing.assert_allclose(lv, out["logvar"], rtol=1e-6)

    def test_vae_and_regressor_paths(self):
        for name, ptype in (("cnn-vae", "seq_modeling"),
                            ("mlp-vae", "reconstruction"),
                            ("regressor", "regression")):
            cfg = ProblemConfig(problem_type=ptype, model_name=name,
                                input_type="visual", latent_size=8,
                                batchsize=2)
            arch = name.split("-")[0]
            if ptype == "regression":
                model = setup_model(name, out_dim=7, conditional=False,
                                    condition_dim=None,
                                    compute_dtype="float32")
            else:
                model = setup_model(name, cross_modal=False, latent_size=8,
                                    architecture=arch, conditional=False,
                                    categorical_conditions=False,
                                    condition_dim=None, input_dim=64 * 64,
                                    compute_dtype="float32")
            rngs = {"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1),
                    "reparam": jax.random.PRNGKey(2)}
            params = model.init(rngs, jnp.zeros((2, 64, 64, 3)), None)["params"]
            s = InferenceSession(cfg, params)
            out = s.predict(visual=_img())
            if ptype == "regression":
                assert out["pose"].shape == (2, 7)
            else:
                assert out["visual"].shape == (2, 64, 64, 3)

    def test_conditional_condition_threads(self):
        s = _mvae_session(use_pose=False, conditional=True, condition_dim=3)
        v = _img()
        a = s.predict(visual=v, condition=jnp.zeros((2, 3)))
        b = s.predict(visual=v, condition=jnp.ones((2, 3)))
        assert not np.allclose(a["mu"], b["mu"])
        assert _infer_condition_dim(s.cfg, s.params) == 3

    def test_uint8_payload_matches_float(self):
        s = _mvae_session(use_pose=False)
        v = _img()
        f = s.predict(visual=v)
        q = s.predict(visual=v, uint8_images=True)
        assert q["visual"].dtype == jnp.uint8
        np.testing.assert_array_equal(
            np.asarray(q["visual"]),
            np.round(np.asarray(f["visual"]) * 255).astype(np.uint8))
        np.testing.assert_allclose(q["mu"], f["mu"], rtol=1e-6)

    def test_single_modality_vae_rejects_wrong_stream(self):
        cfg = ProblemConfig(problem_type="seq_modeling",
                            model_name="cnn-vae", input_type="tactile",
                            latent_size=8, batchsize=2)
        model = setup_model("cnn-vae", cross_modal=False, latent_size=8,
                            architecture="cnn", conditional=False,
                            categorical_conditions=False, condition_dim=None,
                            input_dim=64 * 64, compute_dtype="float32")
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "reparam": jax.random.PRNGKey(2)}
        params = model.init(rngs, jnp.zeros((2, 64, 64, 3)), None)["params"]
        s = InferenceSession(cfg, params)
        with pytest.raises(ValueError, match="tactile"):
            s.predict(visual=_img())
        assert s.predict(tactile=_img())["tactile"].shape == (2, 64, 64, 3)

    def test_conditional_model_requires_condition(self):
        s = _mvae_session(use_pose=False, conditional=True, condition_dim=3)
        with pytest.raises(ValueError, match="conditional"):
            s.predict(visual=_img())

    def test_requires_some_modality(self):
        s = _mvae_session()
        with pytest.raises(ValueError):
            s.predict()


class TestFrozenBN:
    def test_per_example_determinism(self):
        s = _mvae_session(use_pose=True)
        cal_v, cal_t = _img(10, 8), _img(11, 8)
        frozen = s.freeze_bn(visual=cal_v, tactile=cal_t,
                             pose=jnp.zeros((8, 7)))
        v = _img(0, 4)
        # batch-mode serving depends on batch composition...
        full = s.predict(visual=v)
        solo = s.predict(visual=v[:1])
        assert not np.allclose(np.asarray(full["mu"][:1]),
                               np.asarray(solo["mu"]))
        # ...frozen serving does not: row 0 is identical served alone or
        # inside any batch
        f_full = frozen.predict(visual=v)
        f_solo = frozen.predict(visual=v[:1])
        np.testing.assert_allclose(np.asarray(f_full["mu"][:1]),
                                   np.asarray(f_solo["mu"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(f_full["visual"][:1]),
                                   np.asarray(f_solo["visual"]),
                                   rtol=1e-5, atol=1e-6)

    def test_calibration_batch_reproduces_batch_mode(self):
        # served ON the calibration batch itself, frozen stats == batch stats
        s = _mvae_session(use_pose=False)
        v, t = _img(0, 8), _img(1, 8)
        frozen = s.freeze_bn(visual=v, tactile=t)
        a = s.predict(visual=v, tactile=t)
        b = frozen.predict(visual=v, tactile=t)
        np.testing.assert_allclose(np.asarray(a["mu"]), np.asarray(b["mu"]),
                                   rtol=1e-4, atol=1e-5)

    def test_frozen_export_roundtrip(self, tmp_path):
        s = _mvae_session(use_pose=False)
        frozen = s.freeze_bn(visual=_img(10, 8), tactile=_img(11, 8))
        manifest = export_session(frozen, tmp_path / "art", batch_size=2,
                                  modalities=("visual", "tactile"))
        assert manifest["frozen_bn"] is True
        pred = load_exported(tmp_path / "art")
        v, t = _img(0), _img(1)
        live = frozen.predict(visual=v, tactile=t)
        art = pred(visual=v, tactile=t)
        np.testing.assert_allclose(np.asarray(art["mu"]),
                                   np.asarray(live["mu"]), atol=1e-5)

    def test_freeze_bn_is_noop_on_bn_free_model(self):
        # mlp architecture has no BatchNorm: calibration must not KeyError,
        # it warns and returns the (already deterministic) session
        cfg = ProblemConfig(problem_type="reconstruction",
                            model_name="mlp-vae", input_type="visual",
                            latent_size=8, batchsize=2)
        model = setup_model("mlp-vae", cross_modal=False, latent_size=8,
                            architecture="mlp", conditional=False,
                            categorical_conditions=False, condition_dim=None,
                            input_dim=64 * 64, compute_dtype="float32")
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "reparam": jax.random.PRNGKey(2)}
        params = model.init(rngs, jnp.zeros((2, 64, 64, 3)), None)["params"]
        s = InferenceSession(cfg, params)
        with pytest.warns(UserWarning, match="no BatchNorm"):
            frozen = s.freeze_bn(visual=_img(10, 8))
        assert frozen is s
        out = frozen.predict(visual=_img(0))
        assert out["visual"].shape == (2, 64, 64, 3)

    def test_regressor_freeze(self):
        cfg = ProblemConfig(problem_type="regression", model_name="regressor",
                            input_type="visual", batchsize=2)
        model = setup_model("regressor", out_dim=7, conditional=False,
                            condition_dim=None, compute_dtype="float32")
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}
        params = model.init(rngs, jnp.zeros((2, 64, 64, 3)), None)["params"]
        s = InferenceSession(cfg, params)
        frozen = s.freeze_bn(visual=_img(10, 8))
        v = _img(0, 4)
        a = frozen.predict(visual=v[:1])
        b = frozen.predict(visual=v)
        np.testing.assert_allclose(np.asarray(a["pose"]),
                                   np.asarray(b["pose"][:1]),
                                   rtol=1e-5, atol=1e-6)


class TestMeshServing:
    def test_sharded_predict_matches_single_device(self):
        from mmdyn_tpu.parallel.mesh import make_mesh

        cfg = ProblemConfig(problem_type="seq_modeling",
                            model_name="cnn-mvae",
                            input_type="visuotactile", use_pose=True,
                            latent_size=8, batchsize=16)
        model = setup_model(cfg.model_name, cross_modal=True, latent_size=8,
                            use_pose=True, architecture="cnn",
                            conditional=False, categorical_conditions=False,
                            condition_dim=None, compute_dtype="float32")
        img = jnp.zeros((2, 64, 64, 3))
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "reparam": jax.random.PRNGKey(2)}
        params = model.init(rngs, [img, img], jnp.zeros((2, 7)),
                            None)["params"]
        v, t = _img(5, 16), _img(6, 16)

        single = InferenceSession(cfg, params)
        sharded = InferenceSession(cfg, params, mesh=make_mesh(8))
        o1 = single.predict(visual=v, tactile=t)
        o2 = sharded.predict(visual=v, tactile=t)
        # batch shards span the whole mesh; BatchNorm statistics reduce
        # globally under SPMD, so results match single-device up to
        # reduction-order noise
        assert len(o2["visual"].sharding.device_set) == 8
        for k in ("mu", "visual", "tactile", "pose"):
            np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o2[k]),
                                       atol=1e-5)

        compiled = sharded.aot_predict(16, ("visual", "tactile"))
        o3 = compiled(sharded.variables, {"visual": v, "tactile": t}, None,
                      jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(o1["visual"]),
                                   np.asarray(o3["visual"]), atol=1e-5)

        # multi-axis (2, 4) replica/data layout serves identically
        multi = InferenceSession(cfg, params,
                                 mesh=make_mesh(mesh_shape=(2, 4)))
        o4 = multi.predict(visual=v, tactile=t)
        np.testing.assert_allclose(np.asarray(o1["mu"]), np.asarray(o4["mu"]),
                                   atol=1e-5)


class TestRollout:
    def test_shapes_and_first_step_matches_predict(self):
        s = _mvae_session()
        v, t, p = _img(0), _img(1), jnp.zeros((2, 7))
        traj = s.rollout(4, visual=v, tactile=t, pose=p)
        assert traj["visual"].shape == (4, 2, 64, 64, 3)
        assert traj["pose"].shape == (4, 2, 7)
        assert np.isfinite(np.asarray(traj["visual"])).all()
        one = s.predict(visual=v, tactile=t, pose=p)
        np.testing.assert_allclose(traj["visual"][0], one["visual"],
                                   rtol=2e-5, atol=2e-6)

    def test_regression_rejected(self):
        cfg = ProblemConfig(problem_type="regression",
                            model_name="regressor", input_type="visual",
                            batchsize=2)
        model = setup_model("regressor", out_dim=7, conditional=False,
                            condition_dim=None, compute_dtype="float32")
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}
        params = model.init(rngs, jnp.zeros((2, 64, 64, 3)), None)["params"]
        s = InferenceSession(cfg, params)
        with pytest.raises(ValueError):
            s.rollout(3, visual=_img())


class TestAotAndExport:
    def test_aot_matches_jit(self):
        s = _mvae_session(use_pose=False)
        v, t = _img(0), _img(1)
        compiled = s.aot_predict(2, ("tactile", "visual"))
        aout = compiled(s.variables, {"visual": v, "tactile": t}, None,
                        jax.random.PRNGKey(0))
        live = s.predict(visual=v, tactile=t)
        np.testing.assert_allclose(np.asarray(aout["visual"]),
                                   np.asarray(live["visual"]), atol=1e-6)
        assert s.aot_predict(2, ("tactile", "visual")) is compiled  # cached

    def test_export_roundtrip(self, tmp_path):
        s = _mvae_session(use_pose=False)
        manifest = export_session(s, tmp_path / "art", batch_size=2,
                                  modalities=("visual", "tactile"))
        assert "cpu" in manifest["platforms"]
        assert sorted(manifest["modalities"]) == ["tactile", "visual"]
        pred = load_exported(tmp_path / "art")
        v, t = _img(0), _img(1)
        live = s.predict(visual=v, tactile=t)
        art = pred(visual=v, tactile=t)
        for k in ("visual", "tactile", "mu"):
            np.testing.assert_allclose(np.asarray(art[k]),
                                       np.asarray(live[k]), atol=1e-5)
        with pytest.raises(ValueError):
            pred(visual=v)  # missing a manifest modality

    def test_manifest_records_config(self, tmp_path):
        s = _mvae_session(use_pose=False)
        export_session(s, tmp_path / "art", batch_size=2,
                       modalities=("visual", "tactile"))
        with open(tmp_path / "art" / "manifest.json") as f:
            manifest = json.load(f)
        assert manifest["config"]["model_name"] == "cnn-mvae"
        assert manifest["batch_size"] == 2
        assert "mu" in manifest["outputs"]


class TestHttpServing:
    def _post(self, port, path, arrays):
        import http.client
        import io

        buf = io.BytesIO()
        np.savez(buf, **arrays)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", path, body=buf.getvalue())
        resp = conn.getresponse()
        data = resp.read()
        conn.close()
        return resp.status, data

    def test_end_to_end_http(self):
        import http.client
        import io
        import json
        import threading

        from mmdyn_tpu.serve.server import make_server

        s = _mvae_session(use_pose=False, latent=8)
        server = make_server(s, port=0, batch_size=4)  # port 0: OS-assigned
        port = server.server_port
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("GET", "/healthz")
            health = json.loads(conn.getresponse().read())
            conn.close()
            assert health["status"] == "ok"
            assert health["batch_size"] == 4

            v = np.asarray(_img(0, 3))   # 3 < batch 4: pads, truncates back
            status, data = self._post(port, "/predict", {"visual": v})
            assert status == 200
            out = np.load(io.BytesIO(data))
            assert out["visual"].shape == (3, 64, 64, 3)
            assert out["visual"].dtype == np.uint8
            assert out["mu"].shape == (3, 8)
            # the app pads 3 -> 4 before predicting (fixed serving shape);
            # batch-stat BatchNorm makes the result a function of the padded
            # batch, so compare against the padded reference
            vp = np.concatenate([v, v[-1:]])
            live = s.predict(visual=vp, uint8_images=True)
            np.testing.assert_array_equal(out["visual"],
                                          np.asarray(live["visual"])[:3])

            status, data = self._post(port, "/rollout?steps=3",
                                      {"visual": v[:1], "tactile": v[:1]})
            assert status == 200
            traj = np.load(io.BytesIO(data))
            assert traj["visual"].shape == (3, 1, 64, 64, 3)

            status, data = self._post(port, "/predict",
                                      {"bogus": np.zeros((2, 2))})
            assert status == 400
            status, data = self._post(port, "/predict",
                                      {"visual": np.asarray(_img(0, 9))})
            assert status == 400  # exceeds serving batch
        finally:
            server.shutdown()
            thread.join(timeout=10)

    def test_request_hardening_and_shape_buckets(self):
        import http.client
        import io
        import json
        import threading

        from mmdyn_tpu.serve.server import _bucket, make_server

        assert [_bucket(n) for n in (1, 2, 3, 5, 9, 1000)] == \
            [1, 2, 4, 8, 16, 1024]

        s = _mvae_session(use_pose=False, latent=8)
        server = make_server(s, port=0, batch_size=4)
        port = server.server_port
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            # non-numeric Content-Length: 400, not a dropped connection
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.putrequest("POST", "/predict")
            conn.putheader("Content-Length", "banana")
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == 400
            assert "Content-Length" in json.loads(resp.read())["error"]
            conn.close()

            # absurd Content-Length: rejected before buffering the body
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.putrequest("POST", "/predict")
            conn.putheader("Content-Length", str(1 << 40))
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == 400
            conn.close()

            # non-bucket sample n: runs at bucket 4, truncates back to 3
            status, data = self._post(port, "/sample?n=3&seed=7", {})
            assert status == 200
            out = np.load(io.BytesIO(data))
            assert out["visual"].shape == (3, 64, 64, 3)
            # n=3 and n=4 share bucket 4: same program, same draws per seed
            status, data2 = self._post(port, "/sample?n=4&seed=7", {})
            out2 = np.load(io.BytesIO(data2))
            np.testing.assert_array_equal(out["visual"],
                                          out2["visual"][:3])
        finally:
            server.shutdown()
            thread.join(timeout=10)

    def test_microbatching_coalesces_and_matches_solo(self):
        import threading

        from mmdyn_tpu.serve.server import ServingApp

        s = _mvae_session(use_pose=False, latent=8)
        frozen = s.freeze_bn(visual=_img(10, 8), tactile=_img(11, 8))
        app = ServingApp(frozen, batch_size=4, microbatch_wait_ms=300.0)

        import io

        def body(v):
            buf = io.BytesIO()
            np.savez(buf, visual=v)
            return buf.getvalue()

        vs = [np.asarray(_img(i, 1)) for i in range(3)]
        results = [None] * 3

        def post(i):
            results[i] = np.load(io.BytesIO(app.predict(body(vs[i]))))

        threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        # coalesced into fewer device batches than requests
        assert app._batches < 3
        assert app._requests == 3
        # frozen BN: each coalesced result equals the solo prediction up to
        # compile-level numerics (batch-1 vs batch-4 programs order conv
        # reductions differently -> last-ulp noise -> at most 1 uint8 level)
        for i in range(3):
            solo = frozen.predict(visual=vs[i], uint8_images=True)
            diff = np.abs(results[i]["visual"].astype(np.int16)
                          - np.asarray(solo["visual"]).astype(np.int16))
            assert diff.max() <= 1

    def test_microbatching_mixed_signatures_all_served(self):
        import io
        import threading

        from mmdyn_tpu.serve.server import ServingApp

        s = _mvae_session(use_pose=False, latent=8)
        frozen = s.freeze_bn(visual=_img(10, 8), tactile=_img(11, 8))
        app = ServingApp(frozen, batch_size=4, microbatch_wait_ms=150.0)

        def body(**arrays):
            buf = io.BytesIO()
            np.savez(buf, **{k: np.asarray(v) for k, v in arrays.items()})
            return buf.getvalue()

        done = {}

        def post(i, arrays):
            done[i] = np.load(io.BytesIO(app.predict(body(**arrays))))

        # two signatures interleaved: visual-only and visual+tactile —
        # per-signature FIFO groups must serve BOTH
        reqs = [(0, {"visual": _img(0, 1)}),
                (1, {"visual": _img(1, 1), "tactile": _img(2, 1)}),
                (2, {"visual": _img(3, 1)}),
                (3, {"visual": _img(4, 1), "tactile": _img(5, 1)})]
        threads = [threading.Thread(target=post, args=r) for r in reqs]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert sorted(done) == [0, 1, 2, 3]
        for i, arrays in reqs:
            assert done[i]["visual"].shape == (1, 64, 64, 3)
        assert app._requests == 4

    def test_sample_endpoint(self):
        import io

        from mmdyn_tpu.serve.server import ServingApp

        s = _mvae_session(use_pose=False, latent=8)
        app = ServingApp(s, batch_size=2)
        out = np.load(io.BytesIO(app.sample(b"", 4, seed=1)))
        assert out["visual"].shape == (4, 64, 64, 3)
        assert out["tactile"].shape == (4, 64, 64, 3)
        # seeded: deterministic across calls
        out2 = np.load(io.BytesIO(app.sample(b"", 4, seed=1)))
        np.testing.assert_array_equal(out["visual"], out2["visual"])

    def test_cli_requires_exactly_one_source(self):
        from mmdyn_tpu.cli import infer, serve

        for mod in (infer, serve):
            with pytest.raises(SystemExit):
                mod.main(["--frames", "x"] if mod is infer else [])
            with pytest.raises(SystemExit):
                mod.main(["--run", "a", "--torch-ckpt", "b"])

    def test_review_fixes(self, tmp_path):
        """Hardening from the round-3 code review: shape validation before
        grouping, n=0 rejection, sample/rollout caps + uint8 payloads,
        export modality guard, exported-artifact uint8 input scaling, and
        mlp condition-dim inference."""
        import io

        from mmdyn_tpu.serve.server import ServingApp

        s = _mvae_session(use_pose=False, latent=8)
        app = ServingApp(s, batch_size=2)

        def body(**arrays):
            buf = io.BytesIO()
            np.savez(buf, **arrays)
            return buf.getvalue()

        # wrong spatial shape and empty batch: loud ValueError (HTTP 400)
        with pytest.raises(ValueError, match="visual must be"):
            app.predict(body(visual=np.zeros((2, 32, 32, 3), np.float32)))
        with pytest.raises(ValueError, match="empty"):
            app.predict(body(visual=np.zeros((0, 64, 64, 3), np.float32)))
        # sample/rollout bounds
        with pytest.raises(ValueError, match="n must be"):
            app.sample(b"", 100000)
        with pytest.raises(ValueError, match="steps"):
            app.rollout(body(visual=np.zeros((1, 64, 64, 3), np.float32),
                             tactile=np.zeros((1, 64, 64, 3), np.float32)),
                        steps=5000)
        # sample + rollout honour the uint8 wire contract
        out = np.load(io.BytesIO(app.sample(b"", 2)))
        assert out["visual"].dtype == np.uint8
        traj = np.load(io.BytesIO(app.rollout(
            body(visual=np.zeros((1, 64, 64, 3), np.float32),
                 tactile=np.zeros((1, 64, 64, 3), np.float32)), steps=2)))
        assert traj["visual"].dtype == np.uint8

        # export guard: a tactile-only VAE cannot export a visual input
        cfg = ProblemConfig(problem_type="seq_modeling",
                            model_name="cnn-vae", input_type="tactile",
                            latent_size=8, batchsize=2)
        model = setup_model("cnn-vae", cross_modal=False, latent_size=8,
                            architecture="cnn", conditional=False,
                            categorical_conditions=False, condition_dim=None,
                            input_dim=64 * 64, compute_dtype="float32")
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "reparam": jax.random.PRNGKey(2)}
        params = model.init(rngs, jnp.zeros((2, 64, 64, 3)), None)["params"]
        tac = InferenceSession(cfg, params)
        with pytest.raises(ValueError, match="tactile"):
            export_session(tac, tmp_path / "bad", batch_size=2,
                           modalities=("visual",))
        export_session(tac, tmp_path / "good", batch_size=2)  # derived

        # exported artifact scales uint8 inputs like the HTTP server
        pred = load_exported(tmp_path / "good")
        v = np.asarray(_img(0))
        a = pred(tactile=v)
        b = pred(tactile=(v * 255).astype(np.uint8))
        np.testing.assert_allclose(np.asarray(a["mu"]), np.asarray(b["mu"]),
                                   atol=2e-2)  # uint8 quantization of input

    def test_mlp_condition_dim_and_grouped_posterior(self):
        cfg = ProblemConfig(problem_type="reconstruction",
                            model_name="mlp-vae", input_type="visual",
                            conditional=True, condition_dim=3,
                            latent_size=8, batchsize=2)
        model = setup_model("mlp-vae", cross_modal=False, latent_size=8,
                            architecture="mlp", conditional=True,
                            categorical_conditions=False, condition_dim=3,
                            input_dim=64 * 64, compute_dtype="float32")
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "reparam": jax.random.PRNGKey(2)}
        params = model.init(rngs, jnp.zeros((2, 64, 64, 3)),
                            jnp.zeros((6, 3)))["params"]
        assert _infer_condition_dim(cfg, params) == 3   # mlp trunk is 256
        s = InferenceSession(cfg, params)
        out = s.predict(visual=_img(0, 2), condition=jnp.zeros((6, 3)))
        # posterior grouped per input row (B, planes, D), not (3B, D)
        assert out["mu"].shape == (2, 3, 8)
        assert out["visual"].shape == (2, 64, 64, 3)

    def test_uint8_request_payload_accepted(self):
        from mmdyn_tpu.serve.server import ServingApp

        s = _mvae_session(use_pose=False, latent=8)
        app = ServingApp(s, batch_size=2)
        import io

        v8 = (np.asarray(_img(0, 2)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        np.savez(buf, visual=v8)
        out = np.load(io.BytesIO(app.predict(buf.getvalue())))
        ref = s.predict(visual=v8.astype(np.float32) / 255.0,
                        uint8_images=True)
        np.testing.assert_array_equal(out["visual"], np.asarray(ref["visual"]))


class TestFromRun:
    def _fake_run(self, tmp_path, conditional=False, condition_dim=None):
        from mmdyn_tpu.train.checkpoint import save_checkpoint
        from mmdyn_tpu.train.state import create_train_state

        cfg = ProblemConfig(problem_type="seq_modeling",
                            model_name="cnn-mvae",
                            input_type="visuotactile", use_pose=True,
                            conditional=conditional,
                            condition_dim=condition_dim,
                            latent_size=8, batchsize=2)
        model = setup_model(cfg.model_name, cross_modal=True, latent_size=8,
                            use_pose=True, architecture="cnn",
                            conditional=conditional,
                            categorical_conditions=False,
                            condition_dim=condition_dim,
                            compute_dtype="float32")
        img = jnp.zeros((2, 64, 64, 3))
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "reparam": jax.random.PRNGKey(2)}
        cond = jnp.zeros((2, condition_dim)) if conditional else None
        params = model.init(rngs, [img, img], jnp.zeros((2, 7)),
                            cond)["params"]
        state = create_train_state(params, make_optimizer(cfg))

        run = tmp_path / "run_x"
        (run / "checkpoint").mkdir(parents=True)
        saved = {"problem_type": cfg.problem_type,
                 "model_name": cfg.model_name,
                 "input_type": cfg.input_type, "use_pose": True,
                 "conditional": conditional, "mask_loss": False,
                 "kl_weight": 1.0, "pose_multiplier": 1000.0,
                 "latent_size": 8, "annealing_epochs": 50, "lr": 1e-3,
                 "optimizer": "Adam", "batchsize": 2, "num_epochs": 1,
                 "dataset_path": "unused"}
        with open(run / "problem.pkl", "wb") as f:
            pickle.dump(saved, f)
        save_checkpoint(run / "checkpoint", state, 0, 1.0, name="latest")
        return run, params

    def test_loads_without_dataset(self, tmp_path):
        run, params = self._fake_run(tmp_path)
        s = InferenceSession.from_run(run)
        a = jax.tree_util.tree_leaves(params)
        b = jax.tree_util.tree_leaves(s.params)
        assert all(np.allclose(x, y) for x, y in zip(a, b))
        out = s.predict(visual=_img())
        assert out["visual"].shape == (2, 64, 64, 3)

    def test_condition_dim_recovered_from_params(self, tmp_path):
        run, _ = self._fake_run(tmp_path, conditional=True, condition_dim=4)
        s = InferenceSession.from_run(run)
        assert s.cfg.condition_dim == 4
        out = s.predict(visual=_img(), condition=jnp.zeros((2, 4)))
        assert out["visual"].shape == (2, 64, 64, 3)

    def test_condition_dim_recorded_in_norms_wins(self, tmp_path):
        # train-time recording (train/loop.py norms.json) is authoritative;
        # the param-shape probe is only the fallback for pre-field runs
        run, _ = self._fake_run(tmp_path, conditional=True, condition_dim=4)
        with open(run / "norms.json", "w") as f:
            json.dump({"condition_dim": 4, "seq_length": 10}, f)
        s = InferenceSession.from_run(run)
        assert s.cfg.condition_dim == 4
        # a recorded null must also be honoured (non-conditional dataset)
        run2, _ = self._fake_run(tmp_path / "b", conditional=False)
        with open(run2 / "norms.json", "w") as f:
            json.dump({"condition_dim": None, "seq_length": 10}, f)
        s2 = InferenceSession.from_run(run2)
        assert s2.cfg.condition_dim is None

    def test_norms_roundtrip(self, tmp_path):
        run, _ = self._fake_run(tmp_path)
        norms = {"pose_min": [0, 0, 0, -1, -1, -1, -1],
                 "pose_max": [2, 4, 6, 1, 1, 1, 1], "seq_length": 10}
        with open(run / "norms.json", "w") as f:
            json.dump(norms, f)
        s = InferenceSession.from_run(run)
        raw = np.array([[1.0, 2.0, 3.0, 0.0, 0.0, 0.0, 1.0]], np.float32)
        normed = s.normalize_pose(raw)
        np.testing.assert_allclose(s.denormalize_pose(normed), raw,
                                   rtol=1e-6)
        np.testing.assert_allclose(normed[0, :3], [0.5, 0.5, 0.5])

    def test_denormalize_without_norms_raises(self, tmp_path):
        run, _ = self._fake_run(tmp_path)
        s = InferenceSession.from_run(run)
        with pytest.raises(ValueError):
            s.denormalize_pose(np.zeros((1, 7)))

    def test_from_torch_ckpt_roundtrip(self, tmp_path):
        import torch

        from mmdyn_tpu.utils.torch_compat import to_torch_state_dict

        s = _mvae_session(use_pose=True, latent=8)
        sd = to_torch_state_dict(
            "cnn-mvae",
            jax.tree_util.tree_map(np.asarray,
                                   jax.device_get(s.params)))
        ckpt = tmp_path / "epoch_5.ckpt"
        torch.save({"model": {k: torch.tensor(np.ascontiguousarray(v))
                              for k, v in sd.items()},
                    "loss": 1.0, "epoch": 5}, ckpt)

        t = InferenceSession.from_torch_ckpt(ckpt)
        assert t.cfg.latent_size == 8          # inferred from the weights
        assert t.cfg.use_pose is True
        v = _img()
        a = s.predict(visual=v)
        b = t.predict(visual=v)
        for k in ("visual", "tactile", "pose", "mu"):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-5, atol=1e-6)

    def test_missing_checkpoint_raises(self, tmp_path):
        run = tmp_path / "empty_run"
        (run / "checkpoint").mkdir(parents=True)
        with open(run / "problem.pkl", "wb") as f:
            pickle.dump({"problem_type": "seq_modeling",
                         "model_name": "cnn-mvae",
                         "input_type": "visuotactile"}, f)
        with pytest.raises(FileNotFoundError):
            InferenceSession.from_run(run)
