"""Test shim: a minimal PIL package decoding binary PGM (P5) only.

Exists so the real-codec branch of ``operators.multimodal`` can be
golden-fixture-tested in containers without Pillow. It implements exactly
the interface ``_decode_image_real`` consumes: ``PIL.Image.open(fp)`` as a
context manager, ``.convert("L")``, and numpy array conversion — raising
on anything that is not a valid P5 PGM (the corrupt-blob row-outcome
contract)."""
