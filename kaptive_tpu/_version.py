r"""Version of the kaptive-tpu framework.

The reference derives its version from hatch-vcs (``/root/reference/src/kaptive/_version.py``);
here a static version is used, bumped per release.
"""

__version__ = "0.1.0"
