// Dumps HM context-init tables (normative HEVC constants) as Python.
#include <cstdio>
typedef unsigned char UChar; typedef unsigned int UInt; typedef int Int;
enum { MAX_NUM_CHANNEL_TYPE = 2, CONTEXT_NUMBER_OF_TYPES = 4, NUMBER_OF_SLICE_TYPES = 3 };
#include "TLibCommon/ContextTables.h"
#define DUMP(name) do { \
  int rows = sizeof(name)/sizeof(name[0]); \
  int cols = sizeof(name[0])/sizeof(name[0][0]); \
  printf("%s = [\n", #name); \
  for (int r = 0; r < rows; r++) { printf("    ["); \
    for (int c = 0; c < cols; c++) printf("%d, ", name[r][c]); \
    printf("],\n"); } \
  printf("]\n\n"); } while(0)
int main() {
  printf("# Generated from HM-16.2 ContextTables.h (normative HEVC CABAC\n");
  printf("# initialization constants, ITU-T H.265 tables 9-5..9-31).\n\n");
  DUMP(INIT_CU_TRANSQUANT_BYPASS_FLAG);
  DUMP(INIT_SPLIT_FLAG);
  DUMP(INIT_SKIP_FLAG);
  DUMP(INIT_MERGE_FLAG_EXT);
  DUMP(INIT_MERGE_IDX_EXT);
  DUMP(INIT_PART_SIZE);
  DUMP(INIT_PRED_MODE);
  DUMP(INIT_INTRA_PRED_MODE);
  DUMP(INIT_CHROMA_PRED_MODE);
  DUMP(INIT_INTER_DIR);
  DUMP(INIT_MVD);
  DUMP(INIT_REF_PIC);
  DUMP(INIT_DQP);
  DUMP(INIT_CHROMA_QP_ADJ_FLAG);
  DUMP(INIT_CHROMA_QP_ADJ_IDC);
  DUMP(INIT_QT_CBF);
  DUMP(INIT_QT_ROOT_CBF);
  DUMP(INIT_LAST);
  DUMP(INIT_SIG_CG_FLAG);
  DUMP(INIT_SIG_FLAG);
  DUMP(INIT_ONE_FLAG);
  DUMP(INIT_ABS_FLAG);
  DUMP(INIT_MVP_IDX);
  DUMP(INIT_SAO_MERGE_FLAG);
  DUMP(INIT_SAO_TYPE_IDX);
  DUMP(INIT_TRANS_SUBDIV_FLAG);
  DUMP(INIT_TRANSFORMSKIP_FLAG);
  DUMP(INIT_EXPLICIT_RDPCM_FLAG);
  DUMP(INIT_EXPLICIT_RDPCM_DIR);
  DUMP(INIT_CROSS_COMPONENT_PREDICTION);
  return 0;
}
