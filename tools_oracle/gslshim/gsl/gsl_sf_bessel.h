#ifndef GSLSHIM_SF_BESSEL_H
#define GSLSHIM_SF_BESSEL_H
/* only referenced from commented-out reference code; stub declaration */
double gsl_sf_bessel_Kn(int n, double x);
#endif
