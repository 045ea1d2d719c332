#ifndef GSLSHIM_LINALG_H
#define GSLSHIM_LINALG_H
#include "gsl_matrix.h"
#include "gsl_permutation.h"

int gsl_linalg_LU_decomp(gsl_matrix *A, gsl_permutation *p, int *signum);
int gsl_linalg_LU_invert(const gsl_matrix *LU, const gsl_permutation *p,
                         gsl_matrix *inverse);

#endif
