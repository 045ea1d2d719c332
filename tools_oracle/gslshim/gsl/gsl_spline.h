#ifndef GSLSHIM_SPLINE_H
#define GSLSHIM_SPLINE_H
#include <cstddef>
#include "gsl_interp.h"

typedef struct gsl_spline_struct {
    size_t n;
    double *x;
    double *y;
    double *b;   /* piecewise cubic: y + b t + c t^2 + d t^3, t = xq - x_i */
    double *c;
    double *d;
} gsl_spline;

gsl_spline *gsl_spline_alloc(const gsl_interp_type *T, size_t n);
int gsl_spline_init(gsl_spline *s, const double *x, const double *y, size_t n);
double gsl_spline_eval(const gsl_spline *s, double xq, gsl_interp_accel *a);
void gsl_spline_free(gsl_spline *s);

#endif
