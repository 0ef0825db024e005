"""Generate the committed perception golden fixture (perception_golden.npz).

Runs the tiny-config torch/transformers models ONCE (requires a live
torch + transformers install) and freezes (a) their full state_dicts as
numpy arrays, (b) a fixed random input image, and (c) the torch forward
outputs. tests/test_perception.py's golden tests then exercise the
convert_torch_state_dict converters + flax forward against these frozen
activations without torch at runtime — converter regressions are caught
in any environment (VERDICT r3 item 7; the contract being protected is
the reference's pretrained-model usage, roman/map/fastsam_wrapper.py:181-188).

Usage:  python tests/fixtures/gen_perception_golden.py
"""

import os

import numpy as np


def main():
    import torch
    from transformers import (CLIPVisionConfig, CLIPVisionModelWithProjection,
                              Dinov2Config, Dinov2Model)

    out = {}
    rng = np.random.default_rng(12345)
    img = rng.uniform(size=(2, 56, 56, 3)).astype(np.float32)
    out["image"] = img

    # --- DINOv2 tiny config (mirrors test_dinov2_matches_transformers) ---
    tcfg = Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, patch_size=14, image_size=56,
        layerscale_value=0.5,
    )
    torch.manual_seed(0)
    tmodel = Dinov2Model(tcfg).eval()
    with torch.no_grad():
        hidden = tmodel(torch.tensor(img.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    out["dinov2.expected_last_hidden"] = hidden
    for k, v in tmodel.state_dict().items():
        out[f"dinov2.sd.{k}"] = v.detach().cpu().numpy()

    # --- CLIP tiny config (mirrors test_clip_matches_transformers) ---
    ccfg = CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, patch_size=14, image_size=56,
        projection_dim=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(1)
    cmodel = CLIPVisionModelWithProjection(ccfg).eval()
    with torch.no_grad():
        embeds = cmodel(torch.tensor(img.transpose(0, 3, 1, 2))).image_embeds.numpy()
    out["clip.expected_image_embeds"] = embeds
    for k, v in cmodel.state_dict().items():
        out[f"clip.sd.{k}"] = v.detach().cpu().numpy()

    path = os.path.join(os.path.dirname(__file__), "perception_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1024:.0f} KB, "
          f"{len(out)} arrays)")


if __name__ == "__main__":
    main()
