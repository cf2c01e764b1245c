// meshscan: native tokenizer for HEC-MW .msh decks.
//
// TPU-native replacement for the reference's C mesh front end
// (hecmw1/src/common/hecmw_io_hec.c + flex lexer hecmw_heclex.l): the two
// data-heavy cards (!NODE, !ELEMENT) are scanned here at fgets/strtod speed
// into flat arrays; the long tail of small cards stays in Python.
//
// C ABI (ctypes): msh_scan(path) -> handle; getters return sizes/pointers;
// msh_free(handle).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cctype>
#include <cstdint>
#include <string>
#include <vector>

namespace {

struct ElemBlock {
  int etype = 0;
  int nn = 0;                      // nodes per element
  std::vector<int64_t> ids;
  std::vector<int64_t> conn;       // ids.size() * nn, global node ids
};

struct MshData {
  std::vector<int64_t> node_ids;
  std::vector<double> coords;      // n*3
  std::vector<ElemBlock> blocks;
  std::string error;
};

int nodes_per_elem(int etype) {
  switch (etype) {
    case 111: case 301: case 611: return 2;
    case 112: return 3;
    case 231: return 3; case 232: return 6;
    case 241: return 4; case 242: return 8;
    case 341: return 4; case 342: return 10;
    case 351: return 6; case 352: return 15;
    case 361: return 8; case 362: return 20;
    case 731: return 3; case 741: return 4; case 743: return 9;
    case 761: return 6; case 781: return 8;
    case 641: return 4;
    case 3414: return 4;
    default: return -1;
  }
}

bool is_data_line(const char* s) {
  while (*s == ' ' || *s == '\t') ++s;
  if (*s == '\0' || *s == '\r' || *s == '\n') return false;
  return *s != '!' && *s != '#' && *s != '*';
}

// parse comma/space separated numbers from a line
int parse_nums(char* line, double* out, int maxn) {
  int n = 0;
  char* p = line;
  while (*p && n < maxn) {
    while (*p == ' ' || *p == '\t' || *p == ',' || *p == '\r' ||
           *p == '\n') ++p;
    if (!*p) break;
    char* end;
    double v = strtod(p, &end);
    if (end == p) break;
    out[n++] = v;
    p = end;
  }
  return n;
}

}  // namespace

extern "C" {

void* msh_scan(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* d = new MshData();
  char line[8192];
  double nums[64];
  enum Mode { NONE, NODE, ELEM } mode = NONE;
  ElemBlock* cur = nullptr;
  std::vector<int64_t> pend;   // partial element row (continuation lines)
  int64_t pend_id = 0;
  bool pend_has_id = false;    // id read, connectivity (possibly) pending

  while (fgets(line, sizeof line, f)) {
    char* s = line;
    while (*s == ' ' || *s == '\t') ++s;
    if (*s == '!') {
      if (s[1] == '!') continue;      // comment
      mode = NONE;
      cur = nullptr;
      pend.clear();
      pend_has_id = false;
      // card name
      char name[64];
      int k = 0;
      for (char* q = s + 1; *q && *q != ',' && *q != '\r' && *q != '\n'
           && *q != ' ' && k < 63; ++q) name[k++] = (char)toupper(*q);
      name[k] = 0;
      if (strcmp(name, "NODE") == 0) {
        mode = NODE;
      } else if (strcmp(name, "ELEMENT") == 0) {
        // find TYPE=
        const char* t = strstr(s, "TYPE");
        if (!t) t = strstr(s, "type");
        int etype = 0;
        if (t) {
          const char* eq = strchr(t, '=');
          if (eq) etype = atoi(eq + 1);
        }
        int nn = nodes_per_elem(etype);
        if (nn > 0) {
          d->blocks.emplace_back();
          cur = &d->blocks.back();
          cur->etype = etype;
          cur->nn = nn;
          mode = ELEM;
        }
      } else if (strcmp(name, "END") == 0) {
        break;
      }
      continue;
    }
    if (*s == '*') break;             // trailing deck
    if (!is_data_line(s)) continue;
    if (mode == NODE) {
      int n = parse_nums(s, nums, 8);
      if (n >= 1) {
        d->node_ids.push_back((int64_t)nums[0]);
        d->coords.push_back(n > 1 ? nums[1] : 0.0);
        d->coords.push_back(n > 2 ? nums[2] : 0.0);
        d->coords.push_back(n > 3 ? nums[3] : 0.0);
      }
    } else if (mode == ELEM && cur) {
      // token-stream semantics like the reference's flex lexer: the id-read
      // state is tracked separately from pend's fill level (an id alone on
      // its line must not eat the next line's first connectivity value), and
      // a single line may complete several element rows.
      int n = parse_nums(s, nums, 64);
      int i = 0;
      while (i < n) {
        if (!pend_has_id) {
          pend_id = (int64_t)nums[i++];
          pend_has_id = true;
          pend.clear();
        }
        while (i < n && (int)pend.size() < cur->nn)
          pend.push_back((int64_t)nums[i++]);
        if ((int)pend.size() >= cur->nn) {
          cur->ids.push_back(pend_id);
          for (int k = 0; k < cur->nn; ++k) cur->conn.push_back(pend[k]);
          pend.clear();
          pend_has_id = false;
        }
      }
    }
  }
  fclose(f);
  return d;
}

void msh_free(void* h) { delete static_cast<MshData*>(h); }

int64_t msh_n_nodes(void* h) {
  return (int64_t)static_cast<MshData*>(h)->node_ids.size();
}
const int64_t* msh_node_ids(void* h) {
  return static_cast<MshData*>(h)->node_ids.data();
}
const double* msh_coords(void* h) {
  return static_cast<MshData*>(h)->coords.data();
}
int msh_n_blocks(void* h) {
  return (int)static_cast<MshData*>(h)->blocks.size();
}
int msh_block_etype(void* h, int b) {
  return static_cast<MshData*>(h)->blocks[b].etype;
}
int msh_block_nn(void* h, int b) {
  return static_cast<MshData*>(h)->blocks[b].nn;
}
int64_t msh_block_nelem(void* h, int b) {
  return (int64_t)static_cast<MshData*>(h)->blocks[b].ids.size();
}
const int64_t* msh_block_ids(void* h, int b) {
  return static_cast<MshData*>(h)->blocks[b].ids.data();
}
const int64_t* msh_block_conn(void* h, int b) {
  return static_cast<MshData*>(h)->blocks[b].conn.data();
}

}  // extern "C"
