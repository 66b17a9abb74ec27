"""EN↔ZH canonical account-name labels.

Reference: src/parsers/statement_labels.py:7-203 (BALANCE_SHEET_LABELS
70+, INCOME_STATEMENT_LABELS 30+, CASH_FLOW_LABELS 40+, lookup
``get_label`` :185-203). Balance-sheet standard names in this engine are
already the canonical Chinese strings (the reference's parser dict
keys); income/cash-flow standard names are the English keys — this map
supplies their display labels. Exposed as a broadcast dimension
DataFrame for the presentation join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INCOME_STATEMENT_LABELS: dict[str, str] = {
    "operating_revenue": "营业收入",
    "operating_total_revenue": "营业总收入",
    "operating_cost": "营业成本",
    "taxes_and_surcharges": "税金及附加",
    "selling_expenses": "销售费用",
    "administrative_expenses": "管理费用",
    "rd_expenses": "研发费用",
    "financial_expenses": "财务费用",
    "operating_total_cost": "营业总成本",
    "other_income": "其他收益",
    "investment_income": "投资收益",
    "fair_value_change": "公允价值变动收益",
    "credit_impairment": "信用减值损失",
    "asset_impairment": "资产减值损失",
    "asset_disposal": "资产处置收益",
    "operating_profit": "营业利润",
    "non_operating_income": "营业外收入",
    "non_operating_expenses": "营业外支出",
    "total_profit": "利润总额",
    "income_tax": "所得税费用",
    "net_profit": "净利润",
    "continuing_operations_profit": "持续经营净利润",
    "discontinued_operations_profit": "终止经营净利润",
    "parent_net_profit": "归属于母公司所有者的净利润",
    "minority_profit": "少数股东损益",
    "other_comprehensive_income": "其他综合收益的税后净额",
    "total_comprehensive_income": "综合收益总额",
    "parent_comprehensive_income": "归属于母公司所有者的综合收益总额",
    "minority_comprehensive_income": "归属于少数股东的综合收益总额",
    "basic_eps": "基本每股收益（元/股）",
    "diluted_eps": "稀释每股收益（元/股）",
}

CASH_FLOW_LABELS: dict[str, str] = {
    "sales_goods_cash": "销售商品、提供劳务收到的现金",
    "tax_refund": "收到的税费返还",
    "other_operating_inflow": "收到其他与经营活动有关的现金",
    "operating_inflow_subtotal": "经营活动现金流入小计",
    "purchase_goods_cash": "购买商品、接受劳务支付的现金",
    "employee_cash": "支付给职工以及为职工支付的现金",
    "tax_payment": "支付的各项税费",
    "other_operating_outflow": "支付其他与经营活动有关的现金",
    "operating_outflow_subtotal": "经营活动现金流出小计",
    "operating_net_cash_flow": "经营活动产生的现金流量净额",
    "investment_recovery": "收回投资收到的现金",
    "investment_income": "取得投资收益收到的现金",
    "disposal_assets_cash": "处置固定资产、无形资产和其他长期资产收回的现金净额",
    "disposal_subsidiary_cash": "处置子公司及其他营业单位收到的现金净额",
    "other_investing_inflow": "收到其他与投资活动有关的现金",
    "investing_inflow_subtotal": "投资活动现金流入小计",
    "purchase_assets_cash": "购建固定资产、无形资产和其他长期资产支付的现金",
    "investment_payment": "投资支付的现金",
    "acquire_subsidiary_cash": "取得子公司及其他营业单位支付的现金净额",
    "other_investing_outflow": "支付其他与投资活动有关的现金",
    "investing_outflow_subtotal": "投资活动现金流出小计",
    "investing_net_cash_flow": "投资活动产生的现金流量净额",
    "investment_received": "吸收投资收到的现金",
    "minority_investment": "其中：子公司吸收少数股东投资收到的现金",
    "borrowing_received": "取得借款收到的现金",
    "other_financing_inflow": "收到其他与筹资活动有关的现金",
    "financing_inflow_subtotal": "筹资活动现金流入小计",
    "debt_repayment": "偿还债务支付的现金",
    "dividend_interest_payment": "分配股利、利润或偿付利息支付的现金",
    "minority_dividend": "其中：子公司支付给少数股东的股利、利润",
    "other_financing_outflow": "支付其他与筹资活动有关的现金",
    "financing_outflow_subtotal": "筹资活动现金流出小计",
    "financing_net_cash_flow": "筹资活动产生的现金流量净额",
    "exchange_rate_effect": "汇率变动对现金及现金等价物的影响",
    "net_increase_cash": "现金及现金等价物净增加额",
    "beginning_cash_balance": "期初现金及现金等价物余额",
    "ending_cash_balance": "期末现金及现金等价物余额",
}

# balance-sheet totals routed to EN slot keys; everything else is
# already canonical Chinese
BALANCE_TOTAL_LABELS: dict[str, str] = {
    "current_assets_total": "流动资产合计",
    "non_current_assets_total": "非流动资产合计",
    "assets_total": "资产总计",
    "current_liabilities_total": "流动负债合计",
    "non_current_liabilities_total": "非流动负债合计",
    "liabilities_total": "负债合计",
    "parent_equity_total": "归属于母公司所有者权益合计",
    "equity_total": "所有者权益合计",
    "liabilities_and_equity_total": "负债和所有者权益总计",
}


def get_label(key: str, statement_type: str) -> str:
    """statement_labels.get_label semantics (:185-203): fall back to the
    key itself when unmapped."""
    bank = {
        "balance_sheet": BALANCE_TOTAL_LABELS,
        "income_statement": INCOME_STATEMENT_LABELS,
        "cash_flow": CASH_FLOW_LABELS,
    }.get(statement_type, {})
    return bank.get(key, key)


def label_df(spark: SparkSession) -> DataFrame:
    rows = (
        [("balance_sheet", k, v) for k, v in BALANCE_TOTAL_LABELS.items()]
        + [("income_statement", k, v) for k, v in INCOME_STATEMENT_LABELS.items()]
        + [("cash_flow", k, v) for k, v in CASH_FLOW_LABELS.items()]
    )
    return spark.createDataFrame(rows, "statement_type string, standard_name string, label string")


def with_labels(parsed: DataFrame, spark: SparkSession) -> DataFrame:
    """Presentation join: attach canonical display labels to the parsed
    long-format relation (tiny broadcast dimension)."""
    labels = F.broadcast(label_df(spark))
    return parsed.join(labels, ["statement_type", "standard_name"], "left").withColumn(
        "label", F.coalesce("label", "standard_name")
    )
