"""Single-image ADiL demo: attack one image with a pretrained dictionary and
render a 3-panel figure (original | perturbation | adversarial).

Mirror of /root/reference/main.py (argparse at :108-116, model build :40-58,
image load :64-74, ADIL attack :79-85, figure :88-103). Differences by
intent: runs on whatever accelerator JAX provides (the reference aborts
without CUDA, main.py:30-32), panel captions use the model's actual
predictions (the reference hard-codes class indices 2 and 109, main.py:91/:99
— SURVEY.md §2.4), and when no image path is given a synthetic image is used
so the demo is runnable without the ILSVRC tree.

Usage: python -m dl_attack_on_imagenet_tpu.cli.main --model mobilenet \
           [--image path.JPEG] [--data-root ./data/ImageNet]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("adil-demo")
    p.add_argument("--model", "-m", default="mobilenet",
                   help="victim: resnet|densenet|googlenet|inception|mobilenet|vgg|vit")
    p.add_argument("--image", default=None, help="path to a JPEG to attack")
    p.add_argument("--data-root", default="./data/ImageNet")
    p.add_argument("--eps", type=float, default=8 / 255)
    p.add_argument("--steps-inference", type=int, default=100)
    p.add_argument("--dict-dir", default="trained_dicts")
    p.add_argument("--out", default="attack_samples.png")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--input-size", type=int, default=None,
                   help="victim input size; default resolves to the "
                        "reference's blanket 224 crop for every ImageNet "
                        "victim incl. inception (DS_ImageNet.py:14-18), "
                        "native size for the tiny test victim; pass 299 "
                        "for Inception's native size")
    from ._victim import add_victim_args

    add_victim_args(p)
    return p


def main(args) -> str:
    from ..attacks import ADIL
    from ..data.imagenet import default_transform, load_imagenet
    from ..utils import ArtifactCache

    from ._victim import build_victim

    victim = build_victim(args)

    classes = None
    if args.image and os.path.exists(args.image):
        from PIL import Image

        with open(args.image, "rb") as f:
            im = default_transform(Image.open(f), size=victim.input_size)
        try:
            classes = load_imagenet(args.data_root).classes
        except FileNotFoundError:
            classes = None
    else:
        # Synthetic fallback so the demo runs without the dataset on disk.
        im = np.asarray(
            jax.random.uniform(
                jax.random.PRNGKey(1), (victim.input_size, victim.input_size, 3)
            )
        )

    attack = ADIL(
        victim,
        eps=args.eps,
        model_name=args.model,
        steps_inference=args.steps_inference,
        cache=ArtifactCache(args.dict_dir),
    )

    x = jnp.asarray(im, jnp.float32)[None]
    label = victim.predict(x)
    adversary = attack(x, label)
    attack_label = victim.predict(adversary)

    def name_of(idx):
        i = int(idx)
        return classes[i] if classes and i < len(classes) else f"class {i}"

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(np.asarray(x[0]))
    axes[0].set_title(f"original: {name_of(label[0])}", fontsize=18)
    pert = np.asarray(adversary[0] - x[0])
    scaled = (pert + args.eps) / max(float(np.max(pert + args.eps)), 1e-9)
    axes[1].imshow(np.clip(scaled, 0, 1))
    axes[1].set_title("perturbation", fontsize=18)
    axes[2].imshow(np.asarray(adversary[0]))
    axes[2].set_title(f"attack: {name_of(attack_label[0])}", fontsize=18)
    for ax in axes:
        ax.set_axis_off()
    fig.tight_layout(pad=0.5)
    fig.savefig(args.out)
    plt.close(fig)
    print(
        f"label {int(label[0])} ({name_of(label[0])}) -> "
        f"{int(attack_label[0])} ({name_of(attack_label[0])}); figure: {args.out}"
    )
    return args.out


if __name__ == "__main__":
    main(build_argparser().parse_args())
