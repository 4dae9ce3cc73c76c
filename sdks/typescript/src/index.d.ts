/**
 * Type declarations for the Graft TypeScript/JavaScript SDK (src/index.js).
 * Handwritten (no build step): the implementation is plain Node-compatible
 * JS, these types give TS consumers the reference SDK's typed surface.
 */

export interface ClientOptions {
  /** Server base URL; defaults to $GRAFT_ENDPOINT or http://127.0.0.1:9876 */
  endpoint?: string;
  /** Per-request timeout in milliseconds (default 30000) */
  timeoutMs?: number;
}

export interface RunOptions {
  maxRows?: number;
  sessionId?: string;
  pollIntervalMs?: number;
  /** Overall run timeout in milliseconds (default 300000) */
  timeoutMs?: number;
}

export interface ColumnSchema {
  name: string;
  typeName: string;
}

export interface QueryInfo {
  queryId: string;
  status: "queued" | "running" | "finished" | "failed" | "cancelled";
  createdAt?: string;
  completedAt?: string | null;
  error?: string | null;
  schema?: ColumnSchema[];
  rows?: unknown[][];
  totalRows?: number;
  truncated?: boolean;
  pageToken?: string;
}

export interface FlowRunSummary {
  runId: string;
  flowName: string;
  state: string;
  startedAtMillis: number;
  finishedAtMillis?: number | null;
  runTimeMillis?: number | null;
}

export declare class RpcError extends Error {
  status: number;
  rpcMessage: string;
}

export declare class CompilationError extends Error {
  line: number | null;
  column: number | null;
}

export declare class QueryResult {
  queryId: string;
  status: string;
  schema: ColumnSchema[];
  rows: unknown[][];
  totalRows: number;
  truncated: boolean;
  error: string | null;
  readonly columnNames: string[];
  toObjects(): Record<string, unknown>[];
}

export declare class GraftClient {
  constructor(options?: ClientOptions | string);
  endpoint: string;
  status(): Promise<{ version: string; upTimeMs: number }>;
  compile(query: string, target?: string): Promise<string>;
  compileCheck(query: string): Promise<Record<string, unknown>>;
  transpile(sql: string): Promise<string>;
  fmt(query: string): Promise<string>;
  submit(query: string, options?: RunOptions): Promise<string>;
  queryInfo(queryId: string, pageToken?: string): Promise<QueryInfo>;
  cancel(queryId: string): Promise<{ queryId: string; status: string }>;
  run(query: string, options?: RunOptions): Promise<QueryResult>;
  flowRuns(flowName?: string, limit?: number): Promise<FlowRunSummary[]>;
  flowRun(runId: string): Promise<Record<string, unknown>>;
}

export interface CompilerOptions {
  endpoint?: string;
  /** Accepted for reference-SDK parity; the server generates Spark SQL. */
  target?: string;
}

export declare class WvletCompiler {
  constructor(options?: CompilerOptions);
  compile(query: string): Promise<string>;
}

export declare function compile(
  query: string,
  options?: ClientOptions
): Promise<string>;
