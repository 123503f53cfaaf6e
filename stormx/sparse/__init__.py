from stormx.sparse.formats import (
    BSR,
    COO,
    CSR,
    DIA,
    ELL,
    bsr_from_csr,
    csr_from_dense,
    dia_from_csr,
    ell_from_csr,
)

__all__ = [
    "BSR",
    "COO",
    "CSR",
    "DIA",
    "ELL",
    "bsr_from_csr",
    "csr_from_dense",
    "dia_from_csr",
    "ell_from_csr",
]
