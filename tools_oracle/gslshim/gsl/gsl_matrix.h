#ifndef GSLSHIM_MATRIX_H
#define GSLSHIM_MATRIX_H
#include <cstddef>

typedef struct gsl_matrix_struct {
    size_t size1, size2;
    double *data;
    int owner;
} gsl_matrix;

typedef struct gsl_matrix_view_struct {
    gsl_matrix matrix;
} gsl_matrix_view;

gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2);
void gsl_matrix_free(gsl_matrix *m);
double gsl_matrix_get(const gsl_matrix *m, size_t i, size_t j);
gsl_matrix_view gsl_matrix_view_array(double *base, size_t n1, size_t n2);

#endif
