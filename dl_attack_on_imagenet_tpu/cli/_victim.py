"""Shared CLI victim construction: registry build + converted torch weights.

The reference's entry points always run torchvision *pretrained* victims
(main.py:41-52 ``pretrained=True``); this environment ships no weight
archive, so the CLIs default to random init and accept ``--weights`` — a
``torch.save``d state_dict (torchvision format) converted in-process via
``models.convert.load_torch_checkpoint`` (conversion proven against real
torch forwards for all six reference victims,
tests/test_torch_forward_parity*.py).

Order matters with ``--fast-victim``: a checkpoint maps onto the UNFOLDED
variable tree, so the victim is built without ``fold_bn``, the weights are
converted, and the BN fold (exact for eval-mode victims, models/fold.py) is
applied afterwards. ``stem_s2d`` keeps the plain (7,7,3,F) kernel as its
parameter (resnet.py S2DStem), so it is conversion-transparent and can stay
in the constructor.
"""

from __future__ import annotations

import jax


def add_victim_args(p) -> None:
    """Add the victim knobs shared by the CLI entry points."""
    p.add_argument("--weights", default=None,
                   help="path to a torch.save'd torchvision state_dict for "
                        "the victim; converted in-process (models.convert). "
                        "Default: random init (no weight archive ships here)")
    p.add_argument("--fast-victim", action="store_true",
                   help="build the victim with its exact-math fast knobs "
                        "(stem_s2d/fold_bn where applicable; "
                        "models.fast_victim_kwargs)")


def build_victim(args, dtype=None):
    """Build the CLI victim from ``args`` (model/seed/input-size/fast-victim/
    weights), converting + folding in the right order."""
    from ..models import blanket_input_size, create_model, fast_victim_kwargs

    kwargs = {}
    if getattr(args, "fast_victim", False):
        kwargs = dict(fast_victim_kwargs(args.model))
        if not kwargs:
            print(f"warning: --fast-victim has no knobs for "
                  f"'{args.model}'; ignored")
    if dtype is not None:
        kwargs["dtype"] = dtype
    weights = getattr(args, "weights", None)
    # With a checkpoint, build unfolded, convert, then fold (see module doc).
    fold = kwargs.pop("fold_bn", False) if weights else False
    victim = create_model(
        args.model, rng=jax.random.PRNGKey(args.seed),
        input_size=blanket_input_size(args.model, getattr(args, "input_size", None)),
        **kwargs,
    )
    if weights:
        from ..models.convert import load_torch_checkpoint

        victim = load_torch_checkpoint(weights, victim)
        if fold:
            from ..models.fold import fold_victim

            victim = fold_victim(victim)
    return victim
