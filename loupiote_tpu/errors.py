"""Typed errors (reference: `crates/lib/src/errors.rs:1-20`)."""

from __future__ import annotations


class Error(Exception):
    """Base renderer error."""


class FileNotFound(Error):
    pass


class TextureToBufferReadFail(Error):
    pass


class AccelBuild(Error):
    pass
