"""Build hook: compile the native revolve planner into the package.

``librevolve`` (native/revolve.cpp — the binomial/revolve checkpoint-schedule
planner, see adjoint/checkpointing.py) is a plain extern-"C" shared library
loaded with ctypes, not a Python extension module; building it as a
setuptools Extension is the portable way to ship a compiled artifact inside
a wheel. Its absence is never fatal — checkpointing.py falls back to the
byte-identical pure-Python planner — so the extension is marked optional.
"""
from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Never fail the install over the optional native planner."""

    def run(self):
        try:
            super().run()
        except Exception as exc:  # pragma: no cover - toolchain-dependent
            print(f"skipping optional native extension: {exc}")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:  # pragma: no cover - toolchain-dependent
            print(f"skipping optional native extension {ext.name}: {exc}")


setup(
    ext_modules=[
        Extension(
            "adjoint_ode_adaptivity_tpu._native.librevolve",
            sources=["native/revolve.cpp"],
            language="c++",
            extra_compile_args=["-O2", "-std=c++17"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
