"""Fusion-core tests: static-shape splice vs a Python list oracle, end-to-end
forward/loss shapes, text-only batches, truncation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slime_tpu.config import SliMEConfig
from slime_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from slime_tpu.models import llama, slime


@pytest.fixture(scope="module")
def tiny():
    cfg = SliMEConfig.tiny()
    params = slime.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _mk_batch(cfg, B=2, S=16, seed=0, with_image=True):
    rng = np.random.default_rng(seed)
    t = cfg.vision.image_size
    MC = 1 + cfg.max_local_crops
    ids = rng.integers(5, cfg.llm.vocab_size, (B, S)).astype(np.int32)
    mask = np.ones((B, S), bool)
    if with_image:
        ids[:, 3] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :5] = IGNORE_INDEX
    labels = np.where(ids == IMAGE_TOKEN_INDEX, IGNORE_INDEX, labels)
    pix = rng.standard_normal((B, MC, 3, t, t)).astype(np.float32)
    cmask = np.zeros((B, MC), bool)
    cmask[:, 0] = True
    cmask[0, 1:4] = True   # 3 local crops
    cmask[1, 1:MC] = True  # all local crops
    return {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask),
            "pixel_values": jnp.asarray(pix), "crop_mask": jnp.asarray(cmask),
            "labels": jnp.asarray(labels)}


def _splice_oracle(cfg, params, batch, img_embeds, img_valid, max_len):
    """Pure-Python reference of the splice semantics (mirrors llava_arch.py:367-442)."""
    ids = np.asarray(batch["input_ids"])
    mask = np.asarray(batch["attention_mask"])
    labels = np.asarray(batch["labels"])
    emb_table = np.asarray(params["llm"]["embed_tokens"])
    out_e, out_l, out_len = [], [], []
    for b in range(ids.shape[0]):
        e_list, l_list = [], []
        for s in range(ids.shape[1]):
            if ids[b, s] == IMAGE_TOKEN_INDEX:
                for t in range(img_embeds.shape[1]):
                    if img_valid[b, t]:
                        e_list.append(np.asarray(img_embeds)[b, t])
                        l_list.append(IGNORE_INDEX)
            elif mask[b, s]:
                e_list.append(emb_table[ids[b, s]])
                l_list.append(labels[b, s])
        e_arr = np.stack(e_list)[:max_len]
        l_arr = np.asarray(l_list)[:max_len]
        out_len.append(len(e_arr))
        pad = max_len - len(e_arr)
        out_e.append(np.pad(e_arr, ((0, pad), (0, 0))))
        out_l.append(np.pad(l_arr, (0, pad), constant_values=IGNORE_INDEX))
    return np.stack(out_e), np.stack(out_l), np.asarray(out_len)


@pytest.mark.slow  # heavy: compile-bound; runs in the full tier (make test)
def test_splice_matches_oracle(tiny):
    cfg, params = tiny
    batch = _mk_batch(cfg)
    img_embeds, img_valid = slime.encode_images(
        params, cfg, batch["pixel_values"], batch["crop_mask"],
        batch["input_ids"], batch["attention_mask"])
    fused = slime.prepare_multimodal(
        params, cfg, batch["input_ids"], batch["attention_mask"],
        batch["pixel_values"], batch["crop_mask"], batch["labels"], max_len=128)
    ref_e, ref_l, ref_len = _splice_oracle(cfg, params, batch,
                                           img_embeds, img_valid, 128)
    np.testing.assert_array_equal(np.asarray(fused.lengths), ref_len)
    np.testing.assert_allclose(np.asarray(fused.embeds), ref_e, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fused.labels), ref_l)
    # attn mask is contiguous prefix
    for b in range(2):
        assert np.asarray(fused.attn_mask)[b, :ref_len[b]].all()
        assert not np.asarray(fused.attn_mask)[b, ref_len[b]:].any()


@pytest.mark.slow  # heavy: compile-bound; runs in the full tier (make test)
def test_splice_truncation(tiny):
    cfg, params = tiny
    batch = _mk_batch(cfg)
    short = 20
    fused = slime.prepare_multimodal(
        params, cfg, batch["input_ids"], batch["attention_mask"],
        batch["pixel_values"], batch["crop_mask"], batch["labels"], max_len=short)
    img_embeds, img_valid = slime.encode_images(
        params, cfg, batch["pixel_values"], batch["crop_mask"],
        batch["input_ids"], batch["attention_mask"])
    ref_e, ref_l, ref_len = _splice_oracle(cfg, params, batch,
                                           img_embeds, img_valid, short)
    np.testing.assert_allclose(np.asarray(fused.embeds), ref_e, atol=1e-5)
    assert (np.asarray(fused.lengths) == short).all()


def test_text_only_batch(tiny):
    cfg, params = tiny
    batch = _mk_batch(cfg, with_image=False)
    fused = slime.prepare_multimodal(
        params, cfg, batch["input_ids"], batch["attention_mask"],
        batch["pixel_values"], batch["crop_mask"], batch["labels"], max_len=64)
    S = batch["input_ids"].shape[1]
    assert (np.asarray(fused.lengths) == S).all()
    emb_table = np.asarray(params["llm"]["embed_tokens"])
    expected = emb_table[np.asarray(batch["input_ids"])]
    np.testing.assert_allclose(np.asarray(fused.embeds)[:, :S], expected, atol=1e-5)


def test_forward_and_loss(tiny):
    cfg, params = tiny
    batch = _mk_batch(cfg)
    loss, aux = slime.loss_fn(params, cfg, batch, training=False)
    assert np.isfinite(float(loss))
    assert float(loss) > 0
    assert int(aux["n_target_tokens"]) > 0


@pytest.mark.slow
def test_loss_grads_finite(tiny):
    cfg, params = tiny
    batch = _mk_batch(cfg)

    def f(p):
        return slime.loss_fn(p, cfg, batch, training=True,
                             rng=jax.random.PRNGKey(1))[0]

    loss, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # vision params shouldn't be updated in standard SliME training (frozen tower),
    # but grads should still exist & be finite end-to-end
    gn = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert gn > 0


def test_global_local_only_modes(tiny):
    cfg, params = tiny
    batch = _mk_batch(cfg)
    P = cfg.vision.num_patches
    for mode in ("use_global_only", "use_local_only"):
        cfg2 = SliMEConfig(**{**cfg.__dict__, mode: True})
        _, img_valid = slime.encode_images(
            params, cfg2, batch["pixel_values"], batch["crop_mask"],
            batch["input_ids"], batch["attention_mask"])
        iv = np.asarray(img_valid)
        if mode == "use_global_only":
            assert iv[:, :P].all() and not iv[:, P:].any()
        else:
            assert not iv[:, :P + 1].any()


def test_spatial_local_perm():
    from slime_tpu.data.image_ops import spatial_local_perm
    # 2x1 grid (cols=2, rows=1), resampler grid 2 -> 8 tokens
    perm = spatial_local_perm(2, 1, 2, 12)
    # crop-major order: crop0=[0,1,2,3] (2x2), crop1=[4,5,6,7]
    # spatial row-major: row0 = crop0 row0 (0,1), crop1 row0 (4,5), then row1
    assert perm[:8].tolist() == [0, 1, 4, 5, 2, 3, 6, 7]
    assert perm[8:].tolist() == list(range(8, 12))


def test_naive_pad_then_devide_mode():
    from PIL import Image
    from slime_tpu.data.image_ops import process_naive_image_host
    img = Image.new("RGB", (800, 600), (120, 60, 30))
    crops, mask = process_naive_image_host(img)
    assert crops.shape[0] == mask.shape[0]
    assert mask[0] and mask.sum() > 1
    assert np.isfinite(crops[mask]).all()


def test_identity_resampler_path(tiny):
    """No sampler: all crops' patch tokens flow through the projector (flat)."""
    cfg, _ = tiny
    cfg2 = SliMEConfig(**{**cfg.__dict__, "mm_resampler_type": "identity",
                          "mm_projector_type": "mlp2x_gelu"})
    params = slime.init(jax.random.PRNGKey(1), cfg2)
    assert "sampler" not in params
    batch = _mk_batch(cfg2)
    emb, valid = slime.encode_images(
        params, cfg2, batch["pixel_values"], batch["crop_mask"],
        batch["input_ids"], batch["attention_mask"])
    P = cfg2.vision.num_patches
    MC = 1 + cfg2.max_local_crops
    assert emb.shape[1] == MC * P == slime.image_token_budget(cfg2)
    v = np.asarray(valid)
    cm = np.asarray(batch["crop_mask"])
    assert (v.reshape(2, MC, P).any(-1) == cm).all()
    loss, _ = slime.loss_fn(params, cfg2, batch, training=False)
    assert np.isfinite(float(loss))


def test_unpad_merge_path(tiny):
    """'spatial_unpad' (LLaVA-NeXT) merge: padding rows dropped, newline tokens at
    row ends, base view first."""
    from slime_tpu.data.image_ops import unpad_token_order
    cfg, _ = tiny
    cfg2 = SliMEConfig(**{**cfg.__dict__, "mm_resampler_type": "identity",
                          "mm_projector_type": "mlp2x_gelu",
                          "mm_patch_merge_type": "spatial_unpad"})
    params = slime.init(jax.random.PRNGKey(2), cfg2)
    assert "image_newline" in params

    batch = _mk_batch(cfg2)
    P = cfg2.vision.num_patches
    g = cfg2.vision.num_patches_per_side     # tiny: 4
    cols, rows = 2, 1                        # pretend grid for the 3 local crops? use 2x1
    # orig image twice as wide as tall but grid 2x1 is same ratio -> no padding rows
    budget = (1 + cfg2.max_local_crops) * P + rows * g
    src, valid = unpad_token_order(cols, rows, g, (800, 400), budget)
    # every kept row ends with the newline sentinel (-1)
    row_len = cols * g + 1
    assert src[row_len - 1] == -1
    assert valid[:rows * g * row_len].all()

    B = batch["input_ids"].shape[0]
    unpad = (jnp.asarray(np.stack([src] * B)), jnp.asarray(np.stack([valid] * B)))
    emb, iv = slime.encode_images(
        params, cfg2, batch["pixel_values"], batch["crop_mask"],
        batch["input_ids"], batch["attention_mask"], unpad_order=unpad)
    assert emb.shape[1] == P + budget
    iv = np.asarray(iv)
    assert iv[:, :P].all()          # base view always valid
    # newline embedding appears at the expected slot
    nl = np.asarray(params["image_newline"])
    got = np.asarray(emb)[0, P + row_len - 1]
    np.testing.assert_allclose(got, nl, atol=1e-5)


def test_unpad_token_order_drops_padding():
    from slime_tpu.data.image_ops import unpad_token_order
    # tall original in a wide 2x1 grid: columns get dropped
    src, valid = unpad_token_order(2, 1, 4, (100, 400), 200)
    n_loc = 2 * 1 * 16
    kept = sum(1 for i in range(200) if valid[i] and src[i] >= 0)
    assert kept < n_loc  # some columns were padding


@pytest.mark.slow
def test_splice_fuzz(tiny):
    """Randomized splice configurations vs the python oracle: random image-token
    positions (including first/last), random padding masks, random crop counts,
    mixed text-only rows, varying max_len truncation."""
    cfg, params = tiny
    t = cfg.vision.image_size
    MC = 1 + cfg.max_local_crops
    for trial in range(12):
        rng = np.random.default_rng(1000 + trial)
        B = int(rng.integers(1, 4))
        S = int(rng.integers(6, 20))
        ids = rng.integers(5, cfg.llm.vocab_size, (B, S)).astype(np.int32)
        mask = np.ones((B, S), bool)
        for b in range(B):
            if rng.random() < 0.8:  # 20% text-only rows
                ids[b, int(rng.integers(0, S))] = IMAGE_TOKEN_INDEX
            if rng.random() < 0.5:  # right padding
                pad = int(rng.integers(1, max(S // 3, 2)))
                mask[b, S - pad:] = False
                # image token must be inside the valid region
                if (ids[b][mask[b]] == IMAGE_TOKEN_INDEX).sum() == 0:
                    ids[b] = np.where(ids[b] == IMAGE_TOKEN_INDEX, 7, ids[b])
        labels = np.where(ids == IMAGE_TOKEN_INDEX, IGNORE_INDEX, ids)
        pix = rng.standard_normal((B, MC, 3, t, t)).astype(np.float32)
        cmask = np.zeros((B, MC), bool)
        cmask[:, 0] = True
        for b in range(B):
            n_local = int(rng.integers(0, MC))
            cmask[b, 1:1 + n_local] = True
        max_len = int(rng.integers(24, 160))
        batch = {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask),
                 "pixel_values": jnp.asarray(pix), "crop_mask": jnp.asarray(cmask),
                 "labels": jnp.asarray(labels)}
        img_embeds, img_valid = slime.encode_images(
            params, cfg, batch["pixel_values"], batch["crop_mask"],
            batch["input_ids"], batch["attention_mask"])
        fused = slime.prepare_multimodal(
            params, cfg, batch["input_ids"], batch["attention_mask"],
            batch["pixel_values"], batch["crop_mask"], batch["labels"],
            max_len=max_len)
        ref_e, ref_l, ref_len = _splice_oracle(cfg, params, batch,
                                               img_embeds, img_valid, max_len)
        np.testing.assert_array_equal(np.asarray(fused.lengths), ref_len,
                                      err_msg=f"trial {trial}")
        np.testing.assert_allclose(np.asarray(fused.embeds), ref_e, atol=1e-5,
                                   err_msg=f"trial {trial}")
        np.testing.assert_array_equal(np.asarray(fused.labels), ref_l,
                                      err_msg=f"trial {trial}")


def test_uint8_pixel_transport_matches_fp32(tiny):
    """uint8 pixel_values (device-side CLIP normalize, 1/4 the transfer
    bytes) produce the same forward/loss as the fp32 path when the valid
    crops carry the same image data — incl. a partial crop_mask, proving
    the differently-valued PADDED crops never leak."""
    cfg, params = tiny
    batch = _mk_batch(cfg, B=2, S=16, seed=5)
    # uint8 source crops; the fp32 batch is their host-side normalization
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, batch["pixel_values"].shape, np.uint8)
    from slime_tpu.data.image_ops import clip_normalize
    f32 = clip_normalize(u8)
    # fp32 path zeroes padded crops (host layout); uint8 path ships raw zeros
    cm = np.asarray(batch["crop_mask"])[:, :, None, None, None]
    b_f32 = dict(batch, pixel_values=jnp.asarray(f32 * cm))
    b_u8 = dict(batch, pixel_values=jnp.asarray(u8 * cm.astype(np.uint8)))

    l1, _ = slime.loss_fn(params, cfg, b_f32)
    l2, _ = slime.loss_fn(params, cfg, b_u8)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)

    logits1, _ = slime.forward(params, cfg, batch["input_ids"],
                               batch["attention_mask"], b_f32["pixel_values"],
                               batch["crop_mask"])
    logits2, _ = slime.forward(params, cfg, batch["input_ids"],
                               batch["attention_mask"], b_u8["pixel_values"],
                               batch["crop_mask"])
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               atol=2e-5)
