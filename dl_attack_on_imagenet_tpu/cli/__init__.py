"""CLI entry scripts (L6): mirrors of the reference's main.py and
demo_dL_attack.py over the TPU-native stack."""
