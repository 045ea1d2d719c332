#ifndef GSLSHIM_PERMUTATION_H
#define GSLSHIM_PERMUTATION_H
#include <cstddef>

typedef struct gsl_permutation_struct {
    size_t size;
    size_t *data;
} gsl_permutation;

gsl_permutation *gsl_permutation_calloc(size_t n);
void gsl_permutation_free(gsl_permutation *p);

#endif
