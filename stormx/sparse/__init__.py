from stormx.sparse.formats import (
    BSR,
    COO,
    CSR,
    ELL,
    bsr_from_csr,
    csr_from_dense,
    ell_from_csr,
)

__all__ = ["BSR", "COO", "CSR", "ELL", "bsr_from_csr", "csr_from_dense", "ell_from_csr"]
