"""Cosmos video-VAE decoder tests: the CV4x8x8 contract (shape arithmetic,
range, causality) — the upgrade of the reference's decode-row-0 smoke
(`/root/reference/sampling/decoder.py:56-74`)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_diffusion_speedrun_tpu.models.cosmos_vae import (
    CosmosDecoderConfig,
    causal_conv3d,
    cosmos_decode,
    init_cosmos_decoder,
)
from video_diffusion_speedrun_tpu.sampling.decode import (
    save_video,
    to_frames,
    unclamp_video,
)

# tiny config with the same up/down factorization as CV4x8x8
TINY = CosmosDecoderConfig(
    z_channels=16, out_channels=3, channels=8, channels_mult=(1, 2, 2),
    num_res_blocks=1, norm_groups=4, compute_dtype=jnp.float32,
)


def _params():
    return init_cosmos_decoder(jax.random.PRNGKey(0), TINY)


class TestDecoderContract:
    def test_shape_arithmetic(self):
        """latent [B,16,T,h,w] → [B,3,4(T−1)+1,8h,8w] (CV4x8x8 contract)."""
        params = _params()
        for t in (1, 2, 3, 5):
            lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, t, 4, 4))
            out = cosmos_decode(params, TINY, lat)
            assert out.shape == (1, 3, 4 * (t - 1) + 1, 32, 32), (t, out.shape)

    def test_output_range(self):
        params = _params()
        lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 2, 4, 4)) * 3
        out = np.asarray(cosmos_decode(params, TINY, lat))
        assert out.min() >= -1.0 and out.max() <= 1.0
        assert np.isfinite(out).all()

    def test_causality(self):
        """Changing latent frame k must not change output frames < 4(k−1)+1
        (causal decode: frame t depends only on latent frames ≤ ceil(t/4))."""
        params = _params()
        lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 3, 4, 4))
        out1 = np.asarray(cosmos_decode(params, TINY, lat))
        lat2 = lat.at[:, :, 2].set(jax.random.normal(jax.random.PRNGKey(2),
                                                     (1, 16, 4, 4)))
        out2 = np.asarray(cosmos_decode(params, TINY, lat2))
        # latent frame 2 starts influencing at output frame 4·(2−1)+1 = 5
        np.testing.assert_allclose(out1[:, :, :5], out2[:, :, :5],
                                   atol=1e-5)
        assert not np.allclose(out1[:, :, 5:], out2[:, :, 5:], atol=1e-4)

    def test_causal_conv_first_frame_independent(self):
        """A causal conv's first output frame depends only on input frame 0."""
        key = jax.random.PRNGKey(0)
        from video_diffusion_speedrun_tpu.models.cosmos_vae import _conv_init

        p = _conv_init(key, 3, 3, 3, 4, 4)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 5, 8, 8))
        y1 = causal_conv3d(p, x)
        x2 = x.at[:, :, 1:].set(0.0)
        y2 = causal_conv3d(p, x2)
        np.testing.assert_allclose(np.asarray(y1[:, :, 0]),
                                   np.asarray(y2[:, :, 0]), atol=1e-5)


class TestVideoWriting:
    def test_unclamp(self):
        v = np.array([-1.0, 0.0, 1.0], np.float32)
        np.testing.assert_array_equal(unclamp_video(v), [0, 128, 255])

    def test_to_frames_layout(self):
        v = np.zeros((3, 4, 8, 8), np.float32)
        assert to_frames(v).shape == (4, 8, 8, 3)

    def test_save_video_fallback(self, tmp_path):
        v = np.random.RandomState(0).uniform(-1, 1, (3, 4, 16, 16)).astype(
            np.float32)
        out = save_video(v, str(tmp_path), "clip")
        import os

        assert os.path.exists(out)


class TestWeightIO:
    def test_npz_roundtrip(self, tmp_path):
        """init → flatten-to-npz (converter output format) → load → identical."""
        import jax
        import jax.numpy as jnp
        from video_diffusion_speedrun_tpu.models.cosmos_vae import (
            init_cosmos_decoder, load_decoder_params,
        )

        params = init_cosmos_decoder(jax.random.PRNGKey(3), TINY)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        out = {}
        for path, leaf in flat:
            keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
            out[".".join(keys)] = np.asarray(leaf)
        np.savez(tmp_path / "dec.npz", **out)

        loaded = load_decoder_params(str(tmp_path / "dec.npz"), TINY)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestChunkedDecode:
    def test_chunked_exact_without_attention(self):
        """With a context window covering the conv receptive field and no
        bottleneck attention, chunked decode == whole decode."""
        import jax
        from video_diffusion_speedrun_tpu.models.cosmos_vae import (
            decode_video, init_cosmos_decoder,
        )

        cfg = TINY.replace(attn_bottleneck=False) if hasattr(TINY, "replace") \
            else None
        import dataclasses
        cfg = dataclasses.replace(TINY, attn_bottleneck=False)
        params = init_cosmos_decoder(jax.random.PRNGKey(0), cfg)
        lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 6, 4, 4))
        whole = decode_video(params, cfg, lat)
        chunked = decode_video(params, cfg, lat, chunk_frames=2,
                               context_frames=6)
        assert chunked.shape == whole.shape == (1, 3, 21, 32, 32)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole),
                                   atol=1e-5)

    def test_chunked_shape_with_attention(self):
        import dataclasses
        import jax
        from video_diffusion_speedrun_tpu.models.cosmos_vae import (
            decode_video, init_cosmos_decoder,
        )

        params = init_cosmos_decoder(jax.random.PRNGKey(0), TINY)
        lat = jax.random.normal(jax.random.PRNGKey(1), (16, 5, 4, 4))
        out = decode_video(params, TINY, lat, chunk_frames=2, context_frames=1)
        assert out.shape == (3, 17, 32, 32)
        assert np.isfinite(np.asarray(out, np.float32)).all()
