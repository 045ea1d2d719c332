#ifndef GSLSHIM_INTERP_H
#define GSLSHIM_INTERP_H
#include <cstddef>

typedef struct gsl_interp_accel_struct {
    size_t cache;
} gsl_interp_accel;

typedef struct gsl_interp_type_struct {
    int kind;
} gsl_interp_type;

extern const gsl_interp_type *gsl_interp_cspline;

gsl_interp_accel *gsl_interp_accel_alloc(void);
void gsl_interp_accel_free(gsl_interp_accel *a);

#endif
