#!/bin/bash
# Build the reference-model oracle shared library OUTSIDE the repo (in /tmp).
# The oracle compiles the reference C++ sources (read-only at /root/reference)
# with a stubbed N_Vector header, exposing the exact reference RHS through a
# C ABI (tools/oracle.py).  Used only to generate golden test fixtures.
set -e
R=/root/reference/src
O=/tmp/oracle
mkdir -p $O/include/nvector $O/ws/output
ln -sfn /root/reference/input $O/ws/input

cat > $O/include/nvector/nvector_serial.h <<'EOF'
/* Minimal N_Vector stub for compiling the SHUD RHS without SUNDIALS. */
#ifndef NV_STUB_SERIAL_H
#define NV_STUB_SERIAL_H
#ifdef __cplusplus
extern "C" {
#endif
typedef struct _generic_N_Vector {
    double *data;
    long length;
} *N_Vector;
#define NV_DATA_S(v) ((v)->data)
#define NV_Ith_S(v, i) ((v)->data[i])
#ifdef __cplusplus
}
#endif
#endif
EOF

python3 "$(dirname "$0")/gen_harness.py" > $O/harness.cpp

g++ -O2 -fPIC -shared -o $O/liboracle.so \
  -I$R/Model -I$R/classes -I$R/Equations -I$R/ModelData -I$O/include \
  $O/harness.cpp \
  $R/classes/Element.cpp $R/classes/Node.cpp $R/classes/River.cpp $R/classes/Lake.cpp \
  $R/classes/ModelConfigure.cpp $R/classes/Model_Control.cpp $R/classes/TabularData.cpp \
  $R/classes/TimeSeriesData.cpp $R/classes/TimeContext.cpp $R/classes/IO.cpp \
  $R/classes/FloodAlert.cpp $R/classes/AccTemperature.cpp $R/classes/CommandIn.cpp \
  $R/Equations/Equations.cpp $R/Equations/is_sm_et.cpp $R/Equations/SolarRadiation.cpp \
  $R/Equations/Flux_RiverElement.cpp $R/Equations/functions.cpp $R/Equations/funPlatform.cpp \
  $R/Equations/print.cpp \
  $R/ModelData/Model_Data.cpp $R/ModelData/MD_readin.cpp $R/ModelData/MD_initialize.cpp \
  $R/ModelData/MD_CheckInputData.cpp $R/ModelData/MD_f.cpp $R/ModelData/MD_ElementFlux.cpp \
  $R/ModelData/MD_RiverFlux.cpp $R/ModelData/MD_update.cpp $R/ModelData/MD_ET.cpp \
  $R/ModelData/MD_Lake.cpp $R/ModelData/MD_f_uncouple.cpp $R/ModelData/MD_f_omp.cpp \
  $R/Model/f.cpp $R/Model/WaterBalanceDiag.cpp
echo "built $O/liboracle.so"
