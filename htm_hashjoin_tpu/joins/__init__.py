from .nocc import nocc_join
from .atomic import atomic_join
from .htm import htm_join
from .radix import radix_join
from .sortmerge import sortmerge_join
from .npo import npo_join, npo_st_join
from .adaptive import adaptive_join

DISPATCH = {
    "nocc": nocc_join,
    "atomic": atomic_join,
    "htm": htm_join,
    "radix": radix_join,
    "sortmerge": sortmerge_join,
    "npo": npo_join,
    "npo_st": npo_st_join,
    "adaptive": adaptive_join,
}

__all__ = ["nocc_join", "atomic_join", "htm_join", "radix_join",
           "sortmerge_join", "npo_join", "npo_st_join", "adaptive_join",
           "DISPATCH"]
