"""Docstring usage examples double as conformance vectors — the
reference documents nearly every public item with a doctest
(SURVEY.md §4.2, e.g. src/deflate/encode.rs:149-181,
src/gzip.rs:795-802); these run ours the same way."""
import doctest

import pytest


@pytest.mark.parametrize("modname", [
    "libflate_tpu.chunked",
    "libflate_tpu.formats.pgzf",
    "libflate_tpu.formats.gzip",
    "libflate_tpu.formats.zlib",
    "libflate_tpu.formats.deflate",
    "libflate_tpu.serial.deflate",
    "libflate_tpu.utils.checksum",
])
def test_module_doctests(modname):
    mod = __import__(modname, fromlist=["_"])
    result = doctest.testmod(mod, verbose=False)
    assert result.failed == 0, f"{modname}: {result.failed} failures"
