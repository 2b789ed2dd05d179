"""Guidance evaluation suites: QM9 molecules, Amazon-Polarity text,
Species10 genomics (reference guidance_eval/)."""
