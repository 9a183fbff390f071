"""Typed exception hierarchy (Exceptions.hpp:21-149 parity).

The reference carries a message-bearing Exception base with typed
subclasses; file-level errors exit(-1) at read time (ImageBase.cpp:22-27)
and main() maps config errors to numbered exit codes (main.cpp:23-102).
Here they are ordinary Python exceptions raised by the drivers/CLI.
"""

from __future__ import annotations


class CodecError(Exception):
    """Base (Exceptions::Exception)."""

    prefix = "Error"

    def __init__(self, msg: str = ""):
        super().__init__(f"{self.prefix}: {msg}" if msg else self.prefix)


class OutOfBoundsError(CodecError, IndexError):
    prefix = "Index out of bounds"


class NullPointerError(CodecError, ValueError):
    prefix = "Null reference"


class DivideByZeroError(CodecError, ZeroDivisionError):
    prefix = "Divide by zero"


class CastingError(CodecError, TypeError):
    prefix = "Bad cast"


class FileReadError(CodecError, OSError):
    prefix = "Cannot read file"


class FileWriteError(CodecError, OSError):
    prefix = "Cannot write file"


class UnexpectedExtensionError(CodecError, ValueError):
    prefix = "Unexpected file extension"


class StreamFormatError(CodecError, ValueError):
    """Malformed encoded stream (no direct reference analogue: the C++
    decoder reads zeros past the end, BitStream.cpp:14-28, and produces
    garbage; we fail loudly on impossible headers instead)."""

    prefix = "Malformed stream"
