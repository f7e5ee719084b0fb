"""Command-line interface (``src/exe/ppsfm.cc`` twin)."""
