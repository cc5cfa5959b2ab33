"""Serving tools as an installable subpackage (console entry points in
pyproject.toml). The repo-root ``tools/*.py`` shims keep the documented
``python tools/<name>.py`` invocations working from a checkout
(reference analog: installed tool binaries, ``CMakeLists.txt:73-98``)."""
