"""Build hooks: compile the native C++ audio runtime at install time.

``native/libsevit_audio.so`` is a plain ctypes shared library (no Python C
API), so the stock ``build_ext`` needs two tweaks: skip the PyInit export
check and keep a stable ``.so`` filename. If no compiler is available the
build degrades gracefully — ``native.available()`` returns False and the
package falls back to the pure-numpy paths (native/__init__.py also retries
the build via ``make`` on first import).
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class CtypesExtension(Extension):
    pass


class build_ext_ctypes(build_ext):
    def get_export_symbols(self, ext):
        if isinstance(ext, CtypesExtension):
            return ext.export_symbols
        return super().get_export_symbols(ext)

    def get_ext_filename(self, ext_name):
        if ext_name.endswith("libsevit_audio"):
            return ext_name.replace(".", "/") + ".so"
        return super().get_ext_filename(ext_name)

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # no compiler: install pure-python
            print(f"warning: native audio runtime not built ({e}); "
                  "falling back to numpy WAV I/O")


setup(
    ext_modules=[
        CtypesExtension(
            "speech_enhancement_via_hybrid_vision_transformer_project_tpu."
            "native.libsevit_audio",
            sources=[
                "speech_enhancement_via_hybrid_vision_transformer_project_tpu/"
                "native/sevit_audio.cpp"
            ],
            extra_compile_args=["-O3", "-std=c++17", "-fPIC"],
            extra_link_args=["-pthread"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": build_ext_ctypes},
)
