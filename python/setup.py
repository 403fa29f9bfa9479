#!/usr/bin/env python
"""Packaging for the graft PySpark bindings.

Install (editable, offline-safe — no build isolation so the pre-installed
setuptools is used instead of a downloaded backend):

    pip install -e python/ --no-build-isolation

The wrappers are driver-side py4j proxies over the compiled Scala classes;
the JVM side ships separately (sbt package / target/scala-2.13/classes on
the Spark driver classpath). Mirrors the reference library's packaging
(reference: setup.py) with a src-less single-package layout.
"""
from setuptools import setup

VERSION = "0.9.0"

setup(
    name="graft",
    version=VERSION,
    description="Spark-native online state estimation and LLM-corpus "
                "curation operators (PySpark bindings for the graft "
                "Scala library).",
    author="graft developers",
    packages=["graft"],
    package_dir={"graft": "graft"},
    python_requires=">=3.8",
    classifiers=[
        "Programming Language :: Python :: 3",
        "License :: OSI Approved :: Apache Software License",
    ],
    zip_safe=False,
)
